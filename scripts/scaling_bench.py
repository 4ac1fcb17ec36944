#!/usr/bin/env python
"""Scaling-efficiency evidence: run the identical job (scripts/scaling_job.py)
at N and 4N local cores on the same input; report throughput at both and
efficiency = T_4N / (4 · T_N). Writes/updates BENCH.md.

This is the sandbox stand-in for the north rule's two-cluster-size run
(N vs 4N executors) — no real cluster is available, so parallelism level is
the controlled variable (per driver instruction; see BASELINE.md §2).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _job_cmd(cpus: int) -> list[str]:
    # Pin the process tree to exactly `cpus` physical cores: local[N] alone
    # does NOT bound CPU use — N JVM task threads plus N Python UDF workers
    # happily spread over all physical cores, which would make the "small
    # cluster" run secretly as wide as the big one (measured: unpinned
    # local[8] beat local[32]). taskset makes core count the real resource,
    # like executor count on a cluster.
    cmd = [sys.executable, os.path.join(HERE, "scaling_job.py")]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["/usr/bin/taskset", "-c", f"0-{cpus - 1}", *cmd]
    return cmd


RETRY_SLEEP_SEC = 30


def run_at(cpus: int, n_convs: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SCALING_CONVS"] = str(n_convs)
    cmd = _job_cmd(cpus)
    # a long ladder launches many back-to-back JVMs; the sandbox very
    # occasionally kills one, and (observed r6) a job can HANG outright —
    # JVM and Python worker both asleep on their socket, machine idle —
    # so every attempt gets a hard timeout. Without it one wedged job
    # stalls the whole ladder forever (subprocess.run waits unboundedly).
    # 5 min is ~5× the slowest healthy level observed at this input size
    # (2-core full job ≈ 60 s wall incl. JVM start); a kill counts as a
    # failed attempt and retries like any crash. The wedge root cause
    # (loopback-TCP retransmission collapse under host steal) is fixed by
    # the AF_UNIX worker channel in session.py, so this is a backstop.
    job_timeout = int(os.environ.get("SPARK_GRAFT_SCALING_JOB_TIMEOUT", "300"))
    last_err = ""
    for attempt in range(3):
        # own process group so a timeout kill reaps the Spark JVM
        # grandchild too — subprocess.run(timeout=...) kills only the
        # direct child, leaving a zombie JVM holding memory and cores
        # under the next level's measurement
        proc = subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, cwd=REPO, start_new_session=True,
        )
        try:
            stdout, stderr = proc.communicate(timeout=job_timeout)
        except subprocess.TimeoutExpired:
            import signal

            os.killpg(proc.pid, signal.SIGKILL)
            proc.wait()
            last_err = f"timeout after {job_timeout}s (hung job group killed)"
            print(f"[scaling_bench] level {cpus} attempt {attempt + 1}: {last_err}",
                  file=sys.stderr)
            time.sleep(RETRY_SLEEP_SEC)
            continue
        if proc.returncode == 0 and stdout.strip():
            return json.loads(stdout.strip().splitlines()[-1])
        last_err = stderr[-2000:]
        print(f"[scaling_bench] level {cpus} attempt {attempt + 1} failed "
              f"(rc={proc.returncode}); stderr tail:\n{last_err}", file=sys.stderr)
        time.sleep(RETRY_SLEEP_SEC)
    raise RuntimeError(f"scaling job at {cpus} cores failed 3 times: {last_err}")


REF_PATH = os.path.join(HERE, "scaling_reference.json")
LOG_PATH = os.path.join(REPO, "SCALING_LOG.jsonl")


def _canary_gate(n_convs: int) -> dict:
    """Mechanical window tagging (r5 VERDICT #2): before the ladder
    launches, run ONE job at the canary width and compare its throughput
    against the stored prior-round reference band. r5's protocol — retry
    a degraded window — was prose in BENCH.md, so the decision to discard
    two failing attempts was discretionary; this encodes it. The run is
    tagged `healthy` iff canary_tps ≥ healthy_frac × reference level-best
    (0.9 by default: host-steal episodes observed in r4/r5 depressed
    every level 10–25%, while healthy-window run-to-run wobble at 16
    cores stayed within ~8%). A degraded tag AUTO-ANNOTATES the attempt
    row in BENCH.md/SCALING_LOG.jsonl — no judgment call — and the stored
    band only ratchets up after healthy completed runs."""
    ref = {
        "canary_cpus": 16,
        "level_best_tps": None,
        "healthy_frac": 0.9,
        "n_convs": 150000,
    }
    if os.path.exists(REF_PATH):
        with open(REF_PATH) as f:
            ref.update(json.load(f))
    canary = run_at(ref["canary_cpus"], n_convs)
    tps = canary["turns_per_sec"]
    if ref["level_best_tps"] is None or n_convs != ref["n_convs"]:
        # the band is a throughput at the measurement scale — comparing a
        # different-sized input against it would mis-tag the window
        window, band = "uncalibrated", None
    else:
        band = [round(ref["healthy_frac"] * ref["level_best_tps"], 1),
                ref["level_best_tps"]]
        window = "healthy" if tps >= band[0] else "degraded"
    return {
        "canary_cpus": ref["canary_cpus"],
        "canary_tps": tps,
        "window": window,
        "reference_band": band,
        "healthy_frac": ref["healthy_frac"],
        "ref_n_convs": ref["n_convs"],
    }


def _update_reference(canary: dict, best_16_tps: float | None, n_convs: int) -> None:
    """Ratchet the stored band after a run whose window was not degraded:
    reference = max(old, this run's 16-core level-best, canary). Runs at a
    different input scale never touch the band (their throughputs are not
    comparable to it)."""
    if (
        canary["window"] == "degraded"
        or best_16_tps is None
        or n_convs != canary["ref_n_convs"]
    ):
        return
    old = canary.get("reference_band")
    prior = old[1] if old else 0.0
    new_best = max(prior, best_16_tps, canary["canary_tps"])
    with open(REF_PATH, "w") as f:
        json.dump(
            {
                "canary_cpus": canary["canary_cpus"],
                "level_best_tps": round(new_best, 1),
                "healthy_frac": canary["healthy_frac"],
                "n_convs": n_convs,
            },
            f,
        )


def _attempt_log_rows(limit: int = 12) -> str:
    """Markdown attempt table generated from SCALING_LOG.jsonl (r5 VERDICT
    #2: 'BENCH.md's attempt table is generated from it')."""
    if not os.path.exists(LOG_PATH):
        return "| (no logged attempts yet) | | | | |"
    rows = []
    with open(LOG_PATH) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    out = []
    for r in rows[-limit:]:
        band = r.get("reference_band")
        note = f" — {r['note']}" if r.get("note") else ""
        out.append(
            f"| {r.get('when', '?')} | {r.get('window', '?')} "
            f"(canary {r.get('canary_tps', '?')} tps at "
            f"{r.get('canary_cpus', '?')} cores vs band {band}; "
            f"n_convs {r.get('n_convs', '?')}){note} "
            f"| {r.get('per_pass_4to16', '?')} | {r.get('median_4to16', '?')} "
            f"| {'PASS' if r.get('pass') else 'FAIL'} |"
        )
    return "\n".join(out)


def main() -> None:
    n_convs = int(os.environ.get("SPARK_GRAFT_SCALING_CONVS", "150000"))
    os.environ.setdefault("SPARK_GRAFT_SCALING_REPS", "2")
    # Guest vCPU timing is noisy and the noise is ONE-SIDED (the host can
    # only steal cycles, never donate): a single ladder pass can misattribute
    # a lucky small-N run as the engine's baseline and tank the efficiency
    # estimate. Run the full ladder SPARK_GRAFT_SCALING_ROUNDS times,
    # interleaved (4,8,16,32, 4,8,16,32, ...) so a slow-host episode hits
    # all levels equally, and score each level by its best observed
    # throughput — the engine's demonstrated capability at that width.
    rounds = int(os.environ.get("SPARK_GRAFT_SCALING_ROUNDS", "5"))
    levels = [
        int(x)
        for x in os.environ.get("SPARK_GRAFT_SCALING_LEVELS", "4,8,16,32").split(",")
    ]
    canary = _canary_gate(n_convs)
    print(f"[scaling_bench] window: {json.dumps(canary)}", file=sys.stderr)
    # Optional canary-only probe mode: a degraded window means every ladder
    # level is depressed by host steal and the attempt is a foreknown FAIL
    # row — r5 burned two full ~40-min ladders that way. With
    # SPARK_GRAFT_SCALING_SKIP_DEGRADED=1 a degraded canary logs a
    # canary-only row (the probe itself stays auditable) and exits 2, so a
    # retry loop can poll cheaply (~90 s per probe) and the full ladder
    # launches — in this same invocation — only once the window is healthy.
    # Default off: an unattended run still measures and auto-annotates.
    if (
        os.environ.get("SPARK_GRAFT_SCALING_SKIP_DEGRADED") == "1"
        and canary["window"] == "degraded"
    ):
        import datetime

        row = {
            "when": datetime.datetime.now(datetime.timezone.utc).strftime(
                "%Y-%m-%d %H:%MZ"
            ),
            "n_convs": n_convs,
            **canary,
            "per_pass_4to16": None,
            "median_4to16": None,
            "pass": False,
            "note": "canary-only probe: window degraded, ladder not launched "
            "(SPARK_GRAFT_SCALING_SKIP_DEGRADED=1)",
        }
        with open(LOG_PATH, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(json.dumps({**row, "metric": "scaling_canary_probe"}))
        sys.exit(2)
    all_runs: dict[int, list[dict]] = {c: [] for c in levels}
    for _ in range(rounds):
        for c in levels:
            all_runs[c].append(run_at(c, n_convs))
            time.sleep(20)  # let the previous JVM's load drain — back-to-back
            # runs measurably slow the next level's first iteration
    # best-of-passes = demonstrated capability (guest noise is one-sided);
    # mean-of-passes reported alongside so the noise magnitude is visible
    runs = {
        c: max(rs, key=lambda r: r["turns_per_sec"]) for c, rs in all_runs.items()
    }
    mean_tps = {
        c: sum(r["turns_per_sec"] for r in rs) / len(rs)
        for c, rs in all_runs.items()
    }

    def eff(n: int, n4: int, tps=None) -> float:
        t = tps or {c: runs[c]["turns_per_sec"] for c in runs}
        return round(t[n4] / (t[n] * (n4 / n)), 3)

    # Per-PASS paired efficiency: pass i's small-N and big-N runs execute
    # minutes apart under comparable host state, so their ratio is the
    # clean estimator. Each single-number summary of the passes carries a
    # bias (r4 VERDICT #2): the ratio of per-level MAXIMA is biased DOWN
    # when the small level alone catches a lucky host window, the MAX of
    # per-pass ratios is biased UP symmetrically (host steal during a
    # pass's small-N run inflates that pass's ratio), and the MEAN
    # averages host noise into the estimate. The gate therefore scores
    # the MEDIAN of ≥5 per-pass ratios — robust to both one-sided biases
    # — with all three other estimators reported alongside as evidence.
    def eff_per_pass(n: int, n4: int) -> list[float]:
        return [
            round(
                all_runs[n4][i]["turns_per_sec"]
                / (all_runs[n][i]["turns_per_sec"] * (n4 / n)),
                3,
            )
            for i in range(min(len(all_runs[n]), len(all_runs[n4])))
        ]

    pairings = {
        f"{n}to{n4}": eff(n, n4) for n in levels for n4 in levels if n4 == 4 * n
    }
    pairings_mean = {
        f"{n}to{n4}": eff(n, n4, mean_tps)
        for n in levels
        for n4 in levels
        if n4 == 4 * n
    }
    pairings_per_pass = {
        f"{n}to{n4}": eff_per_pass(n, n4)
        for n in levels
        for n4 in levels
        if n4 == 4 * n
    }
    doublings = {
        f"{n}to{n2}_x2": eff(n, n2) for n in levels for n2 in levels if n2 == 2 * n
    }
    # The gate is pinned to the canonical 4→16 pairing. Other N→4N pairings
    # must also pass UNLESS excluded — and an exclusion must be RE-DETECTED
    # from this run's own measurements (r3 ADVICE: a baked-in exclusion
    # would hide a genuine 8→32 regression on well-backed hardware).
    # Detection: vCPU oversubscription shows as per-core throughput
    # collapsing at full width while scaling in the well-backed range
    # (8→16 doubling) stays healthy — a real serial-section regression
    # would degrade the doublings too.
    per_core = {c: runs[c]["turns_per_sec"] / c for c in levels}
    EXCLUDED = {}
    if (
        32 in per_core
        and 16 in per_core
        and per_core[32] < 0.75 * per_core[16]
        and doublings.get("8to16_x2", 0.0) >= 0.8
    ):
        EXCLUDED["8to32"] = (
            "host vCPU oversubscription detected THIS run: per-core "
            f"throughput {round(per_core[32])}/core at 32 vs "
            f"{round(per_core[16])}/core at 16 "
            f"({round(per_core[32] / per_core[16], 2)}x, threshold 0.75) "
            f"while the well-backed 8→16 doubling holds at "
            f"{doublings.get('8to16_x2')} — the wall at full width is "
            "hardware backing, not a serial section (see BENCH.md)"
        )
    def _median(vals: list[float]) -> float:
        s = sorted(vals)
        m = len(s) // 2
        return round(s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2, 3)

    e_4_16 = pairings.get("4to16")
    e_8_16 = doublings.get("8to16_x2")
    e_4_16_med = _median(pairings_per_pass.get("4to16", [0.0]))
    required = {
        k: _median(v) for k, v in pairings_per_pass.items() if k not in EXCLUDED
    }
    ok = (
        e_4_16_med >= 0.8
        and all(v >= 0.8 for v in required.values())
    )
    result = {
        "metric": "scaling_efficiency_4to16",
        "value": e_4_16_med,
        "unit": "ratio",
        "estimator": f"median of {rounds} interleaved paired passes",
        **canary,
        "pairings_median_of_passes": {k: _median(v) for k, v in pairings_per_pass.items()},
        "pairings_best_paired_pass": {k: max(v) for k, v in pairings_per_pass.items()},
        "pairings_per_pass": pairings_per_pass,
        "pairings_best_of_level": {**pairings, **doublings},
        "pairings_mean_of_passes": pairings_mean,
        "excluded_pairings": EXCLUDED,
        "runs": runs,
        "target": 0.8,
        "pass": ok,
    }
    print(json.dumps(result))

    # append the mechanical attempt row and ratchet the reference band
    # (only after non-degraded runs) — the BENCH.md attempt table below is
    # generated from this log, so exclusion of degraded windows is
    # auditable, not discretionary
    import datetime

    log_row = {
        "when": datetime.datetime.now(datetime.timezone.utc).strftime(
            "%Y-%m-%d %H:%MZ"
        ),
        "n_convs": n_convs,
        **canary,
        "per_pass_4to16": pairings_per_pass.get("4to16"),
        "median_4to16": e_4_16_med,
        "pass": ok,
    }
    with open(LOG_PATH, "a") as f:
        f.write(json.dumps(log_row) + "\n")
    _update_reference(canary, runs.get(16, {}).get("turns_per_sec"), n_convs)

    rows = "\n".join(
        f"| {c} | {runs[c]['sec']} | {runs[c]['turns_per_sec']} | "
        f"{round(runs[c]['turns_per_sec'] / c)} |"
        for c in levels
    )
    pair_lines = "\n".join(
        f"- {k.replace('to', ' → ').replace('_x2', ' (×2 doubling)')} cores: "
        + (
            f"**{_median(pairings_per_pass[k])}** median of "
            f"{len(pairings_per_pass[k])} paired passes "
            f"(per pass: {pairings_per_pass[k]}; best pass "
            f"{max(pairings_per_pass[k])}; mean {pairings_mean[k]}; "
            f"ratio-of-level-bests {v})"
            if k in pairings_per_pass
            else f"**{v}**"
        )
        + (f" — EXCLUDED from the gate: {EXCLUDED[k]}" if k in EXCLUDED else "")
        for k, v in sorted(
            {**pairings, **doublings}.items(), key=lambda kv: int(kv[0].split("to")[0])
        )
    )
    gate_line = (
        f"Window gate (mechanical since r6, r5 VERDICT #2): a single "
        f"{canary['canary_cpus']}-core canary ran BEFORE the ladder at "
        f"{canary['canary_tps']} turns/s vs stored reference band "
        f"{canary['reference_band']} (healthy ⟺ canary ≥ "
        f"{canary['healthy_frac']}× prior level-best) → tagged "
        f"**{canary['window']}**; the band ratchets only after "
        f"non-degraded runs and every attempt is appended to "
        f"SCALING_LOG.jsonl, from which the attempt table below is "
        f"generated — a degraded-window FAIL is auto-annotated, never "
        f"discretionarily discarded. "
        f"Gate: canonical **4 → 16 = {e_4_16_med}** (median of {rounds} "
        f"interleaved paired passes, ≥ 0.8: {'PASS' if ok else 'FAIL'}); "
        f"every other N→4N pairing must also pass on its median unless "
        f"listed above as excluded with its measured reason. Estimator "
        f"note (r4 VERDICT #2): each interleaved ladder pass runs its 4- "
        f"and 16-core jobs minutes apart under comparable host conditions, "
        f"so per-pass ratios are the clean measurements — but summarizing "
        f"them by their MAX ({max(pairings_per_pass.get('4to16', [0.0]))}) "
        f"is biased up (host steal during a pass's 4-core run inflates "
        f"that pass's ratio), the ratio of per-level best-ofs ({e_4_16}) "
        f"is biased down (the 4-core level alone catching a lucky host "
        f"window), and the mean ({pairings_mean.get('4to16')}) averages "
        f"host noise into the estimate. The MEDIAN of ≥5 passes is robust "
        f"to both one-sided biases and is the gate criterion; all four "
        f"estimators are reported above."
    )
    md = f"""# BENCH — measured throughput & scaling (this sandbox)

Job: end-to-end triple extraction (Arrow-UDF inference → dedup →
canonicalization) over the deterministic synthetic transcript corpus
({runs[4]['n_convs']} conversations, {runs[4]['n_turns']} turns, incl.
mega-conversation skew). Identical input at every parallelism level; each
process warms up once (Python worker spawn + codegen), then measures. CPU pinned with `taskset -c 0-(N-1)` — `local[N]` alone does
NOT bound CPU (N task threads + N Python UDF workers spread over all
physical cores), which silently widens the "small" run. Each level is the
best of {rounds} interleaved ladder passes × 2 in-process reps: guest vCPU
noise is one-sided (the host only steals cycles), so best-observed
throughput is the engine's demonstrated capability at that width.

| cores | wall sec | turns/sec | per-core |
|---|---|---|---|
{rows}

**Scaling efficiency N→4N** (efficiency = throughput(4N) / (4 × throughput(N));
target ≥ 0.8 per BASELINE.md §2):

{pair_lines}

{gate_line}

## Measurement log (generated from SCALING_LOG.jsonl — all attempts, auto-tagged)

| when (UTC) | window (canary vs reference band) | 4→16 per-pass | median | gate |
|---|---|---|---|---|
{_attempt_log_rows()}

Worker channel (r6). The JVM↔Python-worker data channel runs over Unix
domain sockets (`spark.python.unix.domain.socket.enabled=true`,
session.py) instead of TCP loopback. Root cause, diagnosed live on a
wedged r6 ladder job: under host CPU steal the guest kernel drops
loopback TCP segments, and the worker connection collapses into
exponential retransmission backoff (observed via `ss -tnpi`: backoff 13
→ RTO 120 s, cwnd 1, ~4 MB stranded in both Send-Qs; the Python worker
blocked in `send()`, the executor thread in EPoll — a de-facto hang
that only the ladder's 300 s hard timeout could kill, and the cause of
four burned ladder attempts on 2026-08-17). AF_UNIX cannot drop
in-flight bytes, so the failure mode is structurally gone; it also
removes TCP/IP-stack overhead from every Arrow batch. On a real
cluster the equivalent risk (executor↔worker is always same-host) is
identical, so the conf ships in the engine's defaults, not just the
bench harness.

Measurement notes. Guest vCPU timing on this host is noisy — across
repeated single-pass runs the 4→16 efficiency estimate ranged 0.65–1.01,
driven almost entirely by the 4-core baseline wobbling ±20%; the
best-of-passes protocol above exists to stabilize it. The 8→32 pairing
additionally under-reports the engine: measured per-core throughput drops
when all 32 vCPUs are active even though the guest shows ~98% user CPU and
every Python worker at ~90% — i.e. the Firecracker host does not back all
32 vCPUs with dedicated physical cores (vCPU oversubscription). The wall at
high width is hardware capacity, not a serial section in the job: every
stage is embarrassingly parallel over hash(conv_id) partitions except one
small final dedup shuffle, and the {e_8_16} efficiency measured for 8→16
(doubling within the well-backed core range) shows the per-stage scaling
the same job achieves when cores are real.

Near-dup persist trade (r2 review follow-up). Persisting the shingle/band
tables cut the `near_dup_pairs` physical plan from 8 corpus scans to 1
(pinned by test_plan_quality.py) at the cost of materialization — a small
regression at the 5k-doc sf0.1 headline where job setup dominates. Measured
where scans dominate (bench.py `near_dup_big`, 100k synthetic docs,
32 cores): persist 6.8–17 s vs no-persist 36–49 s across host-noise
conditions — a **2.9–5.4× win** (5.4× on a quiet host), growing with
corpus size (the no-persist plan re-tokenizes the corpus per branch).
Since r5 the decision is ADAPTIVE (`persist_shingles="auto"`, the
default): persist iff Catalyst's driver-side size estimate for the input
exceeds 4 MB, placed inside the measured crossover gap (quiet host, 32
cores: no-persist 1.8× faster at est 1.7 MB / 5k docs; persist 2.1× at
4.6 MB / 20k docs, 2.6× at 11.4 MB / 50k, 2.7–5.4× at ~23 MB / 100k).
bench.py records the pair at BOTH scales every round (`near_dup_big`
≈100k docs, `near_dup_small` = the sf-dir documents table) together with
the auto choice, the size estimate, and whether auto picked the measured
winner — if `auto_picked_winner` is false at either scale on a quiet
round, re-derive the threshold from that round's attempts. Anchor
measurements retry once under load_avg > 4 with all attempts recorded
(round-over-round deltas are attributable).

Reproduce: `python scripts/scaling_bench.py`. Per-operator benchmark
numbers: `python bench.py` (recorded per-round as BENCH_r{{N}}.json).
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Clean-window scaling epoch: loadavg-gated launch + measured neighbor
CPU + abort-on-burst retry (VERDICT r2 item 3).

The box is multi-tenant: neighbor tenants burst to load 10-30 and
contaminate high-parallelism runs. Round 2 documented the contamination
via loadavg snapshots; this protocol goes further and MEASURES the
neighbors directly, so an epoch is accepted or retried on evidence:

- **gate**: poll /proc/loadavg until the 1-min load < --quiet before
  each level's timed window (bounded by --gate-timeout);
- **monitor**: while the bench subprocess runs, sample (a) whole-system
  busy jiffies from /proc/stat and (b) cumulative utime+stime of OUR
  process subtree (the bench python + its Spark JVM + Arrow workers)
  from /proc/<pid>/stat, 1 Hz. neighbor_cores = (system_busy - own) /
  wall -- the average number of cores OTHER tenants burned during the
  window, independent of our own (expected, high) self-load;
- **verdict**: accept the epoch iff neighbor_cores < --neighbor-max at
  EVERY level; otherwise retry the whole epoch up to --attempts times.

Usage:
  python bench_quiet.py [--low 8] [--high 32] [--runs 3]
      [--neighbor-max 1.5] [--quiet 2.0] [--attempts 4]
      [--out BENCH/SCALING_8_32.md] [--cmd bench.py]

Writes the accepted epoch (all levels + per-run neighbor-core evidence)
to --out and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
import time

# /proc accounting shared with bench.py's self-reported neighbor_cores
from bench_util import (
    TICKS as _TICKS,
    proc_table as _proc_table,
    subtree_jiffies as _subtree_jiffies,
    system_busy_jiffies as _system_busy_jiffies,
)


def _loadavg1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def run_monitored(cmd: list[str], env: dict) -> tuple[dict, dict]:
    """Run cmd; return (parsed last-line JSON, window evidence dict)."""
    sys_before = _system_busy_jiffies()
    t0 = time.time()
    proc = subprocess.Popen(
        cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True,
    )
    own: dict[int, int] = {}
    stop = threading.Event()

    def sampler():
        while not stop.is_set():
            try:
                _subtree_jiffies(proc.pid, _proc_table(), own)
            except Exception:
                pass
            stop.wait(0.5)

    th = threading.Thread(target=sampler, daemon=True)
    th.start()
    out, _ = proc.communicate()
    stop.set()
    th.join(timeout=5)
    wall = time.time() - t0
    _subtree_jiffies(proc.pid, _proc_table(), own)  # final sweep
    sys_after = _system_busy_jiffies()
    if proc.returncode != 0:
        raise RuntimeError(f"{cmd} failed rc={proc.returncode}")
    busy = (sys_after - sys_before) / _TICKS
    mine = sum(own.values()) / _TICKS
    evidence = {
        "wall_s": round(wall, 1),
        "own_cores_avg": round(mine / wall, 2),
        "neighbor_cores_avg": round(max(busy - mine, 0.0) / wall, 2),
    }
    return json.loads(out.strip().splitlines()[-1]), evidence


def wait_for_quiet(thresh: float, timeout_s: float) -> bool:
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        load = _loadavg1()
        if load < thresh:
            return True
        print(f"  load {load:.1f} >= {thresh}; waiting ...", file=sys.stderr)
        time.sleep(20)
    return False


def run_paired(args, here: str) -> None:
    """Interleaved (N, 4N) pairs, one timed run per level per pair.

    The box's per-core speed drifts by tens of percent across half-hour
    windows (clean-window local[8] medians of 192.6 -> 160.9 -> 139.3 s
    were observed within one afternoon, with measured neighbor load
    ~0). A sequential-level epoch therefore confounds that drift with
    scaling; pairing the two levels back-to-back (~4 min apart) bounds
    the drift inside each efficiency sample, and the median over pairs
    is the defensible number. Each run still discards one in-JVM warm-up
    and is accepted only if its measured neighbor_cores_avg stays under
    --neighbor-max."""

    def one(cpus: int) -> tuple[dict, dict] | None:
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=args.sf_dir,
                   SPARK_GRAFT_CPUS=str(cpus), BENCH_RUNS="1",
                   BENCH_WARMUP="1")
        res, ev = run_monitored(
            [sys.executable, os.path.join(here, args.cmd)], env)
        print(f"  local[{cpus}]: wall {res['value']}s  neighbors "
              f"{ev['neighbor_cores_avg']} cores", file=sys.stderr)
        if ev["neighbor_cores_avg"] >= args.neighbor_max:
            print("    CONTAMINATED run -> pair discarded", file=sys.stderr)
            return None
        return res, ev

    ratio = args.high / args.low
    pairs = []
    attempts = 0
    while len(pairs) < args.paired and attempts < args.paired + args.attempts:
        attempts += 1
        if not wait_for_quiet(args.quiet, args.gate_timeout):
            print(f"pair {attempts}: gate timeout", file=sys.stderr)
            continue
        print(f"pair {attempts}:", file=sys.stderr)
        lo = one(args.low)
        if lo is None:
            continue
        hi = one(args.high)
        if hi is None:
            continue
        eff = (hi[0]["clips_per_sec"] / lo[0]["clips_per_sec"]) / ratio
        # in-window hardware ceiling probe (~12 s): what perfectly
        # parallel zero-coordination numpy achieves for the SAME core
        # pair right now -- the host's all-core speed swings between
        # windows (observed ceiling 1.01 <-> 0.55), and 32-thread runs
        # track it while 8-thread runs barely move, so each pair's
        # efficiency is only interpretable against ITS OWN ceiling
        # the probe is gated like the bench legs (pairs 14/20/21 read
        # against ceilings depressed by probe-window bursts before this):
        # retry up to 3 times on a contaminated probe, and if the burst
        # outlasts the retries keep the LAST probe but flag it
        for probe_try in range(3):
            cres, cev = run_monitored(
                [sys.executable, os.path.join(here, "bench_ceiling.py")],
                dict(os.environ, CEILING_LEVELS=f"{args.low},{args.high}"))
            if cev["neighbor_cores_avg"] < args.neighbor_max:
                break
            print(f"    probe contaminated "
                  f"({cev['neighbor_cores_avg']} neighbor cores); retrying",
                  file=sys.stderr)
        probe_clean = cev["neighbor_cores_avg"] < args.neighbor_max
        ceil = cres["pairs"][f"{args.low}->{args.high}"]["ceiling"]
        pairs.append({
            "wall_low": lo[0]["value"], "wall_high": hi[0]["value"],
            "tput_low": lo[0]["clips_per_sec"],
            "tput_high": hi[0]["clips_per_sec"],
            "efficiency": round(eff, 3),
            "ceiling": ceil,
            "of_ceiling": round(eff / ceil, 3) if ceil else None,
            "probe_clean": probe_clean,
            "neighbors": [lo[1]["neighbor_cores_avg"],
                          hi[1]["neighbor_cores_avg"],
                          cev["neighbor_cores_avg"]],
            "queries_low": lo[0]["queries"], "queries_high": hi[0]["queries"],
        })
        print(f"  pair efficiency {eff:.3f}  in-window ceiling {ceil} "
              f"-> {eff / ceil:.3f} of ceiling", file=sys.stderr)

    summary = {"mode": "paired", "pairs": pairs, "attempts": attempts}
    if pairs:
        effs = sorted(p["efficiency"] for p in pairs)
        med = effs[len(effs) // 2]
        ofc = sorted(p["of_ceiling"] for p in pairs if p["of_ceiling"])
        med_ofc = ofc[len(ofc) // 2] if ofc else None
        summary["efficiency_median"] = med
        summary["efficiency_all"] = effs
        summary["of_ceiling_median"] = med_ofc
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        rows = "\n".join(
            f"| {i + 1} | {p['wall_low']} | {p['wall_high']} | "
            f"{p['tput_low']} | {p['tput_high']} | {p['efficiency']} | "
            f"{p['ceiling']} | {p['of_ceiling']} | {p['neighbors']} |"
            for i, p in enumerate(pairs)
        )
        best = max(pairs, key=lambda p: p["efficiency"])
        with open(args.out, "w") as f:
            f.write(f"""# BENCH/SCALING_8_32 — interleaved-pair clean-window protocol

The box's per-core speed drifts by tens of percent across half-hour
windows even with ~zero measured neighbor CPU (clean-window
local[{args.low}] walls spanning 139-193 s in one afternoon; the
zero-coordination numpy ceiling for 8->32 swings 0.55 <-> 1.01 between
windows), so a sequential-level epoch confounds host drift with scaling.
This protocol interleaves the two levels back-to-back ({args.paired}
pairs, one discarded in-JVM warm-up + 1 timed run per level per pair,
launch gated on loadavg < {args.quiet}); each run's neighbor CPU is
MEASURED (system busy jiffies minus our own process subtree, 1 Hz) and
any run with >= {args.neighbor_max} neighbor cores discards its pair;
each pair closes with a ~12 s in-window numpy ceiling probe
(bench_ceiling.py, same core pair) so its efficiency is read against
what perfectly-parallel work achieved in the SAME window.

| pair | wall N (s) | wall 4N (s) | clips/s N | clips/s 4N | efficiency | in-window ceiling | eff/ceiling | neighbor cores [N, 4N, probe] |
|---|---|---|---|---|---|---|---|---|
{rows}

**Median pair efficiency (local[{args.low}] -> local[{args.high}]) =
{med:.3f}** over {len(pairs)} clean pairs ({effs});
**median fraction of in-window hardware ceiling = {med_ofc}**.

Per-stage walls of the best pair (efficiency {best['efficiency']}):

- local[{args.low}]: `{json.dumps(best['queries_low'])}`
- local[{args.high}]: `{json.dumps(best['queries_high'])}`

Command: `python bench_quiet.py --paired {args.paired} --low {args.low} --high {args.high} --neighbor-max {args.neighbor_max}`
""")
    print(json.dumps(summary))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--quiet", type=float, default=2.0)
    ap.add_argument("--gate-timeout", type=float, default=1800)
    ap.add_argument("--neighbor-max", type=float, default=1.5)
    ap.add_argument("--attempts", type=int, default=4)
    ap.add_argument("--cmd", default="bench.py")
    # default is a scratch file: BENCH/SCALING_8_32.md is the
    # hand-consolidated round table and two sessions clobbered it by
    # writing here directly -- fold new epochs in manually
    ap.add_argument("--out", default="BENCH/SCALING_8_32_last.md")
    ap.add_argument("--paired", type=int, default=0, metavar="P",
                    help="interleaved mode: P back-to-back (N, 4N) pairs; "
                    "per-pair efficiency, median reported. Defeats the "
                    "box's slow per-core speed drift, which confounds "
                    "sequential-level epochs.")
    args = ap.parse_args()
    here = os.path.dirname(os.path.abspath(__file__))

    if args.paired:
        return run_paired(args, here)

    def level_env(cpus: int) -> dict:
        # BENCH_WARMUP=1: each level discards one in-JVM warm-up run so
        # JIT/codegen cost is not charged to either parallelism level
        return dict(os.environ, SPARK_GRAFT_SF_DIR=args.sf_dir,
                    SPARK_GRAFT_CPUS=str(cpus), BENCH_RUNS=str(args.runs),
                    BENCH_WARMUP="1")

    accepted = None
    history = []
    for attempt in range(1, args.attempts + 1):
        epoch = {}
        clean = True
        for cpus in (args.low, args.high):
            if not wait_for_quiet(args.quiet, args.gate_timeout):
                print(f"attempt {attempt}: gate timeout", file=sys.stderr)
                clean = False
                break
            print(f"attempt {attempt}: local[{cpus}] x{args.runs} ...",
                  file=sys.stderr)
            res, ev = run_monitored(
                [sys.executable, os.path.join(here, args.cmd)],
                level_env(cpus),
            )
            epoch[cpus] = {"result": res, "evidence": ev}
            print(f"  wall {res['value']}s  neighbors "
                  f"{ev['neighbor_cores_avg']} cores", file=sys.stderr)
            if ev["neighbor_cores_avg"] >= args.neighbor_max:
                print("  CONTAMINATED -> retry epoch", file=sys.stderr)
                clean = False
                break
        # in-window hardware ceiling: the same two process counts running
        # ZERO-coordination numpy (bench_ceiling.py) in the same quiet
        # window -- pipeline efficiency is judged against what perfectly
        # parallel work achieves on this box, not against an ideal 4x
        ceiling = None
        if clean and len(epoch) == 2:
            if wait_for_quiet(args.quiet, args.gate_timeout):
                print(f"attempt {attempt}: in-window numpy ceiling ...",
                      file=sys.stderr)
                cres, cev = run_monitored(
                    [sys.executable, os.path.join(here, "bench_ceiling.py")],
                    dict(os.environ),
                )
                key = f"{args.low}->{args.high}"
                ceiling = {
                    "value": cres["pairs"].get(key, {}).get("ceiling"),
                    "evidence": cev,
                }
                print(f"  ceiling {ceiling['value']}  neighbors "
                      f"{cev['neighbor_cores_avg']} cores", file=sys.stderr)
                if cev["neighbor_cores_avg"] >= args.neighbor_max:
                    print("  ceiling window CONTAMINATED -> retry epoch",
                          file=sys.stderr)
                    clean = False
            else:
                clean = False
        history.append({
            "attempt": attempt,
            "levels": {str(c): e["evidence"] for c, e in epoch.items()},
            "ceiling": ceiling,
            "clean": clean,
        })
        if clean and len(epoch) == 2:
            accepted = (epoch, ceiling)
            break

    summary = {"clean": accepted is not None, "attempts": history}
    if accepted:
        epoch, ceiling = accepted
        lo = epoch[args.low]["result"]
        hi = epoch[args.high]["result"]
        ratio = args.high / args.low
        eff = (hi["clips_per_sec"] / lo["clips_per_sec"]) / ratio
        ceil_val = (ceiling or {}).get("value")
        summary.update({
            "low_cpus": args.low, "high_cpus": args.high,
            "tput_low": lo["clips_per_sec"], "tput_high": hi["clips_per_sec"],
            "wall_low": lo["value"], "wall_high": hi["value"],
            "efficiency": round(eff, 3),
            "ceiling": ceil_val,
            "fraction_of_ceiling": (
                round(eff / ceil_val, 3) if ceil_val else None
            ),
        })
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        lo_ev = epoch[args.low]["evidence"]
        hi_ev = epoch[args.high]["evidence"]
        ceil_line = (
            f"**In-window hardware ceiling** (bench_ceiling.py: identical "
            f"zero-coordination numpy work per process, same window, "
            f"neighbors {ceiling['evidence']['neighbor_cores_avg']} cores): "
            f"**{ceil_val}** -- perfectly parallel work does not reach 4x "
            f"on this box (all-core frequency / memory-bandwidth limits). "
            f"Pipeline efficiency / ceiling = "
            f"**{round(eff / ceil_val, 3) if ceil_val else 'n/a'}**."
            if ceil_val else ""
        )
        with open(args.out, "w") as f:
            f.write(f"""# BENCH/SCALING_8_32 — clean-window epoch (measured-neighbor protocol)

Protocol: launch gated on 1-min loadavg < {args.quiet}; during each
level's window (1 discarded in-JVM warm-up + {args.runs} timed runs) the
monitor samples whole-system busy jiffies (/proc/stat) and our own
process subtree's jiffies at 1 Hz;
`neighbor_cores_avg` = (system - own) / wall is the average core count
OTHER tenants burned inside the timed window. The epoch is accepted only
if every level's (and the in-window ceiling run's) neighbor_cores_avg <
{args.neighbor_max}; contaminated epochs are discarded and retried
({len(history)} attempt(s) total, see bench_quiet.py).

| parallelism | median wall (s) | all timed walls (s) | clips/sec | own cores avg | neighbor cores avg |
|---|---|---|---|---|---|
| local[{args.low}] (N) | {lo['value']} | {lo.get('all_walls')} | {lo['clips_per_sec']} | {lo_ev['own_cores_avg']} | {lo_ev['neighbor_cores_avg']} |
| local[{args.high}] (4N) | {hi['value']} | {hi.get('all_walls')} | {hi['clips_per_sec']} | {hi_ev['own_cores_avg']} | {hi_ev['neighbor_cores_avg']} |

**Scaling efficiency = (tput_4N / tput_N) / {ratio:.0f} = {eff:.3f}**

{ceil_line}

Per-stage medians (s):

- local[{args.low}]: `{json.dumps(lo['queries'])}`
- local[{args.high}]: `{json.dumps(hi['queries'])}`

Attempt history: `{json.dumps(history)}`

Command: `python bench_quiet.py --low {args.low} --high {args.high} --runs {args.runs} --neighbor-max {args.neighbor_max}`
""")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

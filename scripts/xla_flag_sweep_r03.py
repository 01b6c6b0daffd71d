"""Sweep XLA compiler flags on the real chip, one bench subprocess per
flag set (XLA_FLAGS is parsed at backend init, so each variant needs a
fresh process; the relay's server-side compile cache keys include the
DebugOptions, so a changed flag set pays one fresh compile).

MEASURED VERDICT (round 3): this route is a dead end on the axon client —
its flag parser F-aborts on TPU-specific DebugOptions ("Unknown flag in
XLA_FLAGS"). Per-jit `compiler_options` DOES reach the relay
(scripts/compiler_opts_probe.py): scoped-vmem 64 MB global is ~7% SLOWER,
latency-hiding scheduler exactly neutral on one chip. See BENCH_NOTES.md.

Usage:  python scripts/xla_flag_sweep_r03.py [--steps 24]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = {
    # name -> extra XLA flags appended to whatever the env already sets
    "baseline": "",
    "vmem64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "lhs": "--xla_tpu_enable_latency_hiding_scheduler=true",
    "vmem64m_lhs": ("--xla_tpu_scoped_vmem_limit_kib=65536 "
                    "--xla_tpu_enable_latency_hiding_scheduler=true"),
}


def run_variant(name: str, flags: str, steps: int) -> dict:
    env = dict(os.environ)
    base = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = (base + " " + flags).strip()
    cmd = [sys.executable, "bench.py", "--steps", str(steps)]
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=3600)
    out = {}
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            out = json.loads(line)
    if proc.returncode != 0 or "value" not in out:
        return {"name": name, "error": proc.stderr[-500:] or "no output"}
    return {"name": name, "flags": flags, "frames_per_sec": out["value"],
            "vs_baseline": out["vs_baseline"]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--only", default=None,
                    help="comma-separated variant names to run")
    args = ap.parse_args()
    names = (args.only.split(",") if args.only else list(VARIANTS))
    for name in names:
        res = run_variant(name, VARIANTS[name], args.steps)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()

"""Run every opt-in hardening gate and record the results as a
driver-auditable artifact: ``python gates.py --round N`` → ``GATES_rN.json``.

Gates (each is an opt-in pytest suite; see the per-file skipif reasons):

- sf0.1 sweep    — full-registry oracle parity at 10× the driver fixture
                   (SPARK_GRAFT_SWEEP_SF01, tests/test_oracle_parity.py)
- TZ sweep       — time-touching queries re-checked under exotic session
                   timezones (SPARK_GRAFT_TZ_SWEEP)
- plan lint      — every batch plan scanned for cartesian products /
                   unpushed scans (SPARK_GRAFT_PLAN_LINT, tests/test_plans.py)
- skew gate      — adversarial fixtures: df-cap and salted join must beat
                   naive ≥2× (SPARK_GRAFT_SKEW_GATE, tests/test_skew_gate.py;
                   measured ratios merged in from .gates/skew.json)

Sequential on purpose: one local Spark at a time is safe in this container.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))

GATES = [
    {
        "name": "sweep_sf01",
        "env": {"SPARK_GRAFT_SWEEP_SF01": "1"},
        "args": ["tests/test_oracle_parity.py", "-k", "sf01"],
    },
    {
        "name": "tz_sweep",
        "env": {"SPARK_GRAFT_TZ_SWEEP": "1"},
        "args": ["tests/test_oracle_parity.py", "-k", "exotic_tz"],
    },
    {
        "name": "plan_lint",
        "env": {"SPARK_GRAFT_PLAN_LINT": "1"},
        "args": ["tests/test_plans.py", "-k", "cartesian"],
    },
    {
        "name": "skew_gate",
        "env": {"SPARK_GRAFT_SKEW_GATE": "1"},
        "args": ["tests/test_skew_gate.py"],
    },
    {
        "name": "retry_gate",
        "env": {"SPARK_GRAFT_RETRY_GATE": "1"},
        "args": ["tests/test_retry_gate.py"],
    },
]

_SUMMARY_RE = re.compile(
    r"(?:(?P<failed>\d+) failed)?(?:, )?(?P<passed>\d+) passed"
    r"(?:, (?P<skipped>\d+) skipped)?(?:, \d+ deselected)?"
)


def run_gate(gate: dict) -> dict:
    env = dict(os.environ)
    env.update(gate["env"])
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", *gate["args"]],
        cwd=_REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    wall = round(time.time() - t0, 1)
    tail = "\n".join(proc.stdout.strip().splitlines()[-3:])
    passed = failed = skipped = None
    for line in reversed(proc.stdout.strip().splitlines()):
        m = _SUMMARY_RE.search(line)
        if m and m.group("passed"):
            passed = int(m.group("passed"))
            failed = int(m.group("failed") or 0)
            skipped = int(m.group("skipped") or 0)
            break
    return {
        "rc": proc.returncode,
        "passed": passed,
        "failed": failed,
        "skipped": skipped,
        "wall_sec": wall,
        "tail": tail[-400:],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument(
        "--only", default=None, help="comma-list of gate names to run"
    )
    args = ap.parse_args()
    wanted = set(args.only.split(",")) if args.only else None

    out: dict = {"round": args.round, "gates": {}}
    ok = True
    for gate in GATES:
        if wanted and gate["name"] not in wanted:
            continue
        print(f"=== {gate['name']} ...", flush=True)
        res = run_gate(gate)
        out["gates"][gate["name"]] = res
        ok = ok and res["rc"] == 0
        print(f"    rc={res['rc']} passed={res['passed']} "
              f"failed={res['failed']} in {res['wall_sec']}s", flush=True)

    for detail_key, fname, gname in (
        ("skew_measurements", "skew.json", "skew_gate"),
        ("retry_measurements", "retry.json", "retry_gate"),
    ):
        detail = os.path.join(_REPO, ".gates", fname)
        if os.path.exists(detail) and (not wanted or gname in wanted):
            with open(detail) as f:
                out[detail_key] = json.load(f)

    path = os.path.join(_REPO, f"GATES_r{args.round:02d}.json")
    # merge with a prior partial run of other gates this round
    if wanted and os.path.exists(path):
        with open(path) as f:
            prior = json.load(f)
        prior["gates"].update(out["gates"])
        for k in ("skew_measurements", "retry_measurements"):
            if k in out:
                prior[k] = out[k]
        out = prior
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {path}; all green: {ok}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

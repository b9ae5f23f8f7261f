"""Per-stage profiler for the device prover pipelines (VERDICT r4 #4).

Re-proves a chain level through prove() (which routes to the streamed
device pipeline, prover/stream.py, for max-domain >= 2^23 shapes, or the
resident pipeline, prover/device_prove.py, below) and attributes
wall-clock to the pipeline's stage boundaries (the `progress` callbacks:
interpolate, tree0/1 commit, interaction, tree2, composition, tree3,
OODS sampling, quotient group evals, FRI tail).  Two passes are timed —
cold (compiles included) and warm (steady state) — and the warm table is
appended to docs/perf.md format on request.

Usage:
  python tools/profile_prover.py 13          # profile chain level 13
  python tools/profile_prover.py 13 --json   # one JSON line per stage
"""

import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


class StageTimer:
    """progress-callback adapter: wall-clock per named stage.

    A stage's duration is the gap since the previous message (the
    pipeline logs *after* finishing a stage); the residual between the
    last message and total is attributed to 'fri_tail+serialize'."""

    def __init__(self, echo=True):
        self.t0 = time.time()
        self.last = self.t0
        self.rows = []
        self.echo = echo

    def __call__(self, msg):
        now = time.time()
        dt = now - self.last
        self.rows.append((msg, dt))
        self.last = now
        if self.echo:
            print(f"  [{now - self.t0:7.1f}s +{dt:5.1f}] {msg}", flush=True)

    def finish(self, label="fri_tail+serialize"):
        now = time.time()
        self.rows.append((label, now - self.last))
        self.last = now
        return now - self.t0


def profile_level(level: int, as_json=False):
    from recursion_chain import INPUTS3, LEVELS, PRESETS, load_input
    from recursive_stwo_tpu.prover.prove import prove
    from recursive_stwo_tpu.recursion.pipeline import build_verifier_circuit

    inp, mult, outp, preset = LEVELS[level - 1]
    proof = load_input(inp)
    config = PRESETS[preset]
    print(f"level {level}: input {inp}, x{mult}, preset {preset}", flush=True)

    t0 = time.time()
    cs = None
    for k in range(mult):
        cs, _ = build_verifier_circuit(
            proof, list(INPUTS3), cs=cs, finalize=False, cross_check=(k == 0)
        )
    cs.pad()
    cs.check_arithmetics()
    cs.populate_logup_arguments()
    cs.check_poseidon_invocations()
    trace = cs.generate_trace()
    print(f"  circuit: {time.time() - t0:.1f}s", flush=True)

    results = {}
    for phase in ("cold", "warm"):
        timer = StageTimer(echo=not as_json)
        t1 = time.time()
        prove(trace, config, progress=timer)
        total = timer.finish()
        results[phase] = {"total_s": round(total, 1), "stages": [
            {"stage": m, "s": round(dt, 2)} for m, dt in timer.rows
        ]}
        print(f"  {phase} total: {total:.1f}s", flush=True)

    if as_json:
        print(json.dumps({"level": level, **results}))
    else:
        print(f"\nlevel {level} warm stage table:")
        for row in results["warm"]["stages"]:
            print(f"  {row['s']:8.2f}s  {row['stage']}")
    return results


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    as_json = "--json" in sys.argv
    for lvl in args:
        profile_level(int(lvl), as_json=as_json)

"""Measure the optimizer-memory/grad-dtype knobs on hardware (VERDICT r3
item 2): run bench.py's pretrain measurement under each knob configuration
sequentially on the one real chip and print a result table.

Runs in-process (one jax runtime, persistent compile cache shared) by
re-importing bench's _measure_pretrain with the env set per config. Each
config's programs differ (dtype changes recompile), so expect a few minutes
of compile per config on a cold cache.

Run from the repo root: python benchmarks/knob_sweep.py [config ...]
Config names: base nu16 nu16sr g16 nu16g16 nu16g16sr b32 (default: all).
"""
import json
import os
import subprocess
import sys

CONFIGS = {
    "base": {},
    "nu16": {"BENCH_NU_DTYPE": "bfloat16"},
    "nu16sr": {"BENCH_NU_DTYPE": "bfloat16", "BENCH_STATE_SR": "1"},
    "g16": {"BENCH_GRAD_DTYPE": "bfloat16"},
    "nu16g16": {"BENCH_NU_DTYPE": "bfloat16", "BENCH_GRAD_DTYPE": "bfloat16"},
    "nu16g16sr": {
        "BENCH_NU_DTYPE": "bfloat16",
        "BENCH_GRAD_DTYPE": "bfloat16",
        "BENCH_STATE_SR": "1",
    },
    "b32": {"BENCH_BATCH": "32"},
    "b64": {"BENCH_BATCH": "64"},
    "b128": {"BENCH_BATCH": "128"},
    "unroll15": {"BENCH_UNROLL": "15"},
    "b64unroll15": {"BENCH_BATCH": "64", "BENCH_UNROLL": "15"},
    "attnfused": {"VLN_BEVBERT_FUSED_ATTN_DROPOUT": "1"},
    "b64attnfused": {"BENCH_BATCH": "64",
                     "VLN_BEVBERT_FUSED_ATTN_DROPOUT": "1"},
    "b32nu16g16": {
        "BENCH_BATCH": "32",
        "BENCH_NU_DTYPE": "bfloat16",
        "BENCH_GRAD_DTYPE": "bfloat16",
    },
    "rematdots": {"VLN_BEVBERT_REMAT_ATTN": "dots"},
    "rematfull": {"VLN_BEVBERT_REMAT_ATTN": "full"},
    "b64rematdots": {"BENCH_BATCH": "64", "VLN_BEVBERT_REMAT_ATTN": "dots"},
    "b128rematfull": {"BENCH_BATCH": "128", "VLN_BEVBERT_REMAT_ATTN": "full"},
}


def main():
    names = sys.argv[1:] or list(CONFIGS)
    results = {}
    for name in names:
        env = dict(os.environ)
        env.update(CONFIGS[name])
        env["BENCH_SKIP_FT"] = "1"
        env["BENCH_SKIP_LOADER"] = "1"  # also skips the e2e system bench

        print(f"=== {name}: {CONFIGS[name]}", flush=True)
        # subprocess per config: dtype knobs are read at state-init time and
        # a fresh runtime guarantees no stale donated buffers; never two jax
        # processes at once on this 1-core host
        p = subprocess.run(
            [sys.executable, "bench.py"],
            env=env, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else ""
        try:
            out = json.loads(line)
            results[name] = {
                "samples_per_sec": out["value"], "mfu": out["mfu"],
            }
        except (json.JSONDecodeError, KeyError):
            results[name] = {"error": (p.stderr or p.stdout)[-400:]}
        print(json.dumps({name: results[name]}), flush=True)
    print("=== summary")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

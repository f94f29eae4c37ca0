"""Measure the optimizer-memory/grad-dtype knobs on hardware (VERDICT r3
item 2): run bench.py's pretrain measurement under each knob configuration
sequentially on the one real chip and print a result table.

Runs one fresh `python bench.py` SUBPROCESS per config (knobs are read at
state-init time; a fresh runtime guarantees no stale donated buffers, and
this 1-core host must never run two jax processes at once). The persistent
compile cache on disk is shared across configs, but each config's programs
differ (dtype/remat changes recompile), so expect a few minutes of compile
per new config even on a warm cache.

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
    "b128rematdots": {"BENCH_BATCH": "128", "VLN_BEVBERT_REMAT_ATTN": "dots"},
    "fusedadamw": {"BENCH_FUSED_ADAMW": "1"},
    "b64fusedadamw": {"BENCH_BATCH": "64", "BENCH_FUSED_ADAMW": "1"},
    "multmask": {"VLN_BEVBERT_MULT_MASK": "1"},
    "boolmask": {"VLN_BEVBERT_BOOL_MASK": "1"},
    "b64boolmask": {"BENCH_BATCH": "64", "VLN_BEVBERT_BOOL_MASK": "1"},
    "multmaskfusedadamw": {"VLN_BEVBERT_MULT_MASK": "1",
                           "BENCH_FUSED_ADAMW": "1"},
}


def _parse_headline(stdout: str):
    """Last parseable headline JSON line (bench prints the headline first,
    then an enriched final line; either satisfies the sweep)."""
    for line in reversed(stdout.strip().splitlines()):
        try:
            out = json.loads(line)
            if "value" in out and "mfu" in out:
                return out
        except json.JSONDecodeError:
            continue
    return None


def main():
    names = sys.argv[1:] or list(CONFIGS)
    unknown = [n for n in names if n not in CONFIGS]
    if unknown:
        sys.exit(f"unknown config(s) {unknown}; valid: {sorted(CONFIGS)}")
    # a hung bench (tunnel stall) must not wedge the whole sweep: generous
    # per-config ceiling (cold compiles can take ~25 min through the tunnel)
    timeout_s = int(os.environ.get("KNOB_SWEEP_TIMEOUT_S", "3600"))
    results = {}
    for name in names:
        env = dict(os.environ)
        env.update(CONFIGS[name])
        env["BENCH_SKIP_FT"] = "1"
        env["BENCH_SKIP_LOADER"] = "1"  # also skips the e2e system bench
        env["BENCH_SKIP_B64"] = "1"  # knob probes measure ONE config each

        print(f"=== {name}: {CONFIGS[name]}", flush=True)
        try:
            p = subprocess.run(
                [sys.executable, "bench.py"],
                env=env, capture_output=True, text=True, timeout=timeout_s,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            )
        except subprocess.TimeoutExpired as e:
            tail = (e.stderr or b"")
            tail = tail.decode(errors="replace") if isinstance(tail, bytes) else tail
            results[name] = {"error": f"timeout after {timeout_s}s: {tail[-300:]}"}
            print(json.dumps({name: results[name]}), flush=True)
            continue
        out = _parse_headline(p.stdout)
        if out is not None:
            results[name] = {
                "samples_per_sec": out["value"], "mfu": out["mfu"],
            }
        else:
            results[name] = {"error": (p.stderr or p.stdout)[-400:]}
        print(json.dumps({name: results[name]}), flush=True)
    print("=== summary")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

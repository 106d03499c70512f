"""Standalone Mixtral end-to-end bench: run bench.py's mix_* phases at
one (L, E, T) rung without the llama ladder in front (the full bench
camps on the 32L rungs first; when the pool's competitor squats for the
whole window, the mixtral row never gets its turn).

Usage: MIXB_RUNG=8,2,4 python experiments/mixtral_bench_only.py
Prints one JSON line with the same mixtral_* keys run_mixtral emits.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench


def main():
    li, ei, ti = (int(x) for x in
                  os.environ.get("MIXB_RUNG", "8,2,4").split(","))
    env = {"BENCH_MIX_EXPERTS": str(ei)}
    recs = {}
    for phase in ("mix_ours", "mix_naive_bf16", "mix_naive_w8"):
        rc, rec = bench.run_phase(phase, li, ti, extra_env=env)
        if rc != 0 or rec is None or "error" in (rec or {}):
            print(json.dumps({"error": f"phase {phase} rc={rc}: "
                              f"{(rec or {}).get('error', 'no record')}"}),
                  flush=True)
            return 1
        recs[phase] = rec
    recs = bench._recheck_w8(recs, "mix_naive_w8", "mix_naive_bf16",
                             lambda: bench.run_phase("mix_naive_w8", li,
                                                     ti, extra_env=env))
    t = recs["mix_ours"]["t_step"]
    out = {
        "metric": "mixtral_multitenant_1bit_decode_speedup_vs_naive",
        "value": round(recs["mix_naive_bf16"]["t_step"] * ti / t, 3),
        "mixtral_speedup_vs_naive_w8": round(
            recs["mix_naive_w8"]["t_step"] * ti / t, 3),
        "mixtral_tok_s_per_chip": round(ti / t, 1),
        "mixtral_ms_per_step": round(t * 1e3, 2),
        "mixtral_config": (f"{li}L x {ei}E(topk{bench.MIX_TOPK}) x "
                           f"T{ti}, Mistral width, W8 base + routed "
                           f"pair deltas"),
    }
    if "engine_tok_s" in recs["mix_ours"]:
        out["mixtral_engine_tok_s"] = round(
            recs["mix_ours"]["engine_tok_s"], 1)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Greedy-decode drift of w4a8 (int4 FFN weights) vs int8 on a TRAINED
checkpoint.

docs/README.md's `APERTIS_QUANT_BITS=4` row promises "quality drift vs
int8 is model-dependent — measure on a trained checkpoint before
enabling"; this is that measurement. Two passes over the same prompts
(one process each — the quant bits are read at params-quantize / engine
attach time), then a token-level comparison:

  python tools/int4_drift.py run --model /tmp/deep_run/best_model \
      --data /tmp/pysrc_corpus/val.jsonl --bits 8 --out /tmp/gen8.json
  python tools/int4_drift.py run ... --bits 4 --out /tmp/gen4.json
  python tools/int4_drift.py compare /tmp/gen8.json /tmp/gen4.json

`run` truncates each text row to --prompt-tokens HF-tokenizer tokens
(rows shorter than that are skipped), batches them, greedy-decodes
--new tokens through the serving engine (the int4 path engages the same
fused decode kernels the bench measures at rows >= 128), and writes the
generated ids. `compare` reports exact-sequence agreement, per-token
agreement, and the mean first-divergence index — the numbers a user
needs to decide whether halved weight bandwidth is worth it for their
model.
"""
import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def cmd_run(args):
    import os

    os.environ["APERTIS_QUANT_BITS"] = str(args.bits)
    import numpy as np

    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(args.tokenizer)
    prompts = []
    with open(args.data, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            text = json.loads(line).get("text", "")
            ids = tok.encode(text, add_special_tokens=False)
            if len(ids) >= args.prompt_tokens:
                prompts.append(ids[:args.prompt_tokens])
            if len(prompts) >= args.n:
                break
    if len(prompts) < args.n:
        print(f"warning: only {len(prompts)} rows had >= "
              f"{args.prompt_tokens} tokens", file=sys.stderr)
    # One fixed batch shape: pad the prompt list up to a multiple of
    # --batch by repeating the first rows (dropped from the output).
    n_real = len(prompts)
    while len(prompts) % args.batch:
        prompts.append(prompts[0])

    from apertis_llm_tpu.config import ApertisConfig
    from apertis_llm_tpu.inference.engine import InferenceEngine
    from apertis_llm_tpu.models.convert import load_pretrained
    from apertis_llm_tpu.models.quantize import quantize_params

    import jax

    config, params = load_pretrained(args.model)
    params = jax.jit(quantize_params)(params)
    jax.block_until_ready(params)
    engine = InferenceEngine(config, params)

    ids = np.asarray(prompts, np.int32)
    outs = []
    for i in range(0, len(ids), args.batch):
        out = engine.generate(ids[i:i + args.batch],
                              max_new_tokens=args.new, do_sample=False,
                              eos_token_id=())
        outs.append(np.asarray(out)[:, -args.new:])
    gen = np.concatenate(outs)[:n_real]
    Path(args.out).write_text(json.dumps({
        "bits": args.bits, "model": args.model, "new": args.new,
        "prompt_tokens": args.prompt_tokens,
        "tokens": gen.tolist(),
    }))
    print(f"wrote {gen.shape} generated ids (bits={args.bits}) "
          f"to {args.out}")


def cmd_compare(args):
    import numpy as np

    a = json.loads(Path(args.a).read_text())
    b = json.loads(Path(args.b).read_text())
    ta, tb = np.asarray(a["tokens"]), np.asarray(b["tokens"])
    assert ta.shape == tb.shape, (ta.shape, tb.shape)
    eq = ta == tb
    exact = eq.all(axis=1)
    # First divergence per row (row length when rows agree fully).
    first_div = np.where(exact, ta.shape[1], eq.argmin(axis=1))
    out = {
        "rows": int(ta.shape[0]), "new_tokens": int(ta.shape[1]),
        "bits": [a["bits"], b["bits"]],
        "exact_sequence_agreement": round(float(exact.mean()), 4),
        "per_token_agreement": round(float(eq.mean()), 4),
        "mean_first_divergence_tok": round(float(first_div.mean()), 1),
        "median_first_divergence_tok": float(np.median(first_div)),
    }
    print(json.dumps(out))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    r = sub.add_parser("run")
    r.add_argument("--model", required=True)
    r.add_argument("--data", required=True)
    r.add_argument("--tokenizer", default="/tmp/pysrc_corpus/tokenizer")
    r.add_argument("--bits", type=int, choices=[4, 8], required=True)
    r.add_argument("--out", required=True)
    r.add_argument("--n", type=int, default=128)
    r.add_argument("--prompt-tokens", type=int, default=64)
    r.add_argument("--new", type=int, default=64)
    r.add_argument("--batch", type=int, default=128)
    r.set_defaults(fn=cmd_run)
    c = sub.add_parser("compare")
    c.add_argument("a")
    c.add_argument("b")
    c.set_defaults(fn=cmd_compare)
    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()

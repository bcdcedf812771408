#!/usr/bin/env python
"""Build the local Python-source pretraining corpus (round-3 quality run).

This environment has no network egress, so the largest real-text corpus
available is the ~490 MB of Python source installed on the machine
(site-packages + the stdlib). This script turns it into a pretraining
corpus through the framework's own data-pipeline dedup:

  1. walk the source trees, keep 1 KB..200 KB UTF-8 ``.py`` files,
  2. exact-dedup by content hash, near-dedup with the framework's
     MinHash/LSH stage (data_pipeline/minhash.py),
  3. deterministic shuffle, hold out 0.6%% of FILES as validation,
  4. train a byte-level BPE tokenizer (HF `tokenizers`) on the train split,
  5. write: val.jsonl (raw text rows), train_packed.jsonl (token-id rows,
     eos-joined and packed to --seq-len with zero padding waste — the
     pretrain dataset accepts list-form "text" rows), tokenizer/ dir
     loadable by transformers, and an MC eval set (mc.jsonl) of
     next-line code-completion items from held-out files.

Usage: python tools/build_pysrc_corpus.py --out /tmp/pysrc_corpus
"""

import argparse
import hashlib
import json
import os
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SOURCES = ("/opt/venv/lib/python3.12/site-packages", "/usr/lib/python3.12")


def collect_files():
    files = []
    for base in SOURCES:
        for root, dirs, names in os.walk(base):
            dirs[:] = [d for d in dirs if d not in ("__pycache__",)]
            for n in sorted(names):
                if n.endswith(".py"):
                    p = os.path.join(root, n)
                    try:
                        size = os.path.getsize(p)
                    except OSError:
                        continue
                    if 1024 <= size <= 200_000:
                        files.append(p)
    return sorted(files)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--seq-len", type=int, default=1024)
    ap.add_argument("--vocab-size", type=int, default=16384)
    ap.add_argument("--val-frac", type=float, default=0.006)
    ap.add_argument("--mc-items", type=int, default=250)
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    files = collect_files()
    print(f"{len(files)} candidate files")

    texts, seen = [], set()
    for p in files:
        try:
            t = Path(p).read_text("utf-8")
        except (UnicodeDecodeError, OSError):
            continue
        hs = hashlib.sha1(t.encode()).hexdigest()
        if hs in seen:
            continue
        seen.add(hs)
        texts.append(t)
    print(f"{len(texts)} exact-unique files")

    from apertis_llm_tpu.data_pipeline.minhash import deduplicate_texts
    kept_idx = deduplicate_texts(texts, threshold=0.85)
    texts = [texts[i] for i in kept_idx]
    print(f"{len(texts)} after MinHash near-dedup")

    rng = random.Random(0)
    rng.shuffle(texts)
    n_val = max(8, int(len(texts) * args.val_frac))
    val, train = texts[:n_val], texts[n_val:]
    print(f"train files {len(train)}, val files {n_val}")

    # ---- tokenizer -----------------------------------------------------
    from tokenizers import Tokenizer, models, pre_tokenizers, decoders, trainers
    tok = Tokenizer(models.BPE(unk_token=None))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=args.vocab_size - 4,
        special_tokens=["<pad>", "<bos>", "<eos>", "<unk>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(iter(train), trainer=trainer, length=len(train))
    tdir = out / "tokenizer"
    tdir.mkdir(exist_ok=True)
    tok.save(str(tdir / "tokenizer.json"))
    (tdir / "tokenizer_config.json").write_text(json.dumps({
        "tokenizer_class": "PreTrainedTokenizerFast",
        "pad_token": "<pad>", "bos_token": "<bos>",
        "eos_token": "<eos>", "unk_token": "<unk>",
        "model_max_length": 1_000_000}))
    (tdir / "special_tokens_map.json").write_text(json.dumps({
        "pad_token": "<pad>", "bos_token": "<bos>",
        "eos_token": "<eos>", "unk_token": "<unk>"}))
    print(f"tokenizer saved ({tok.get_vocab_size()} tokens)")

    eos = tok.token_to_id("<eos>")

    # ---- packed train rows --------------------------------------------
    n_tok = 0
    buf = []
    with open(out / "train_packed.jsonl", "w") as f:
        for t in train:
            ids = tok.encode(t).ids + [eos]
            n_tok += len(ids)
            buf.extend(ids)
            while len(buf) >= args.seq_len:
                f.write(json.dumps({"text": buf[:args.seq_len]}) + "\n")
                buf = buf[args.seq_len:]
    print(f"train tokens: {n_tok:,} ({n_tok // args.seq_len:,} rows)")

    with open(out / "val.jsonl", "w") as f:
        for t in val:
            f.write(json.dumps({"text": t}) + "\n")
    v_tok = sum(len(tok.encode(t).ids) for t in val)
    print(f"val tokens: {v_tok:,}")

    # ---- MC eval: next-line completion from held-out files -------------
    mc_rng = random.Random(1)
    items = []
    def lines_of(t):
        return [l for l in t.splitlines()
                if 20 <= len(l.strip()) <= 120 and not l.strip().startswith("#")]
    pool = [l for t in val for l in lines_of(t)]
    attempts = 0
    while len(items) < args.mc_items and attempts < args.mc_items * 20:
        attempts += 1
        t = mc_rng.choice(val)
        ls = t.splitlines()
        good = [i for i in range(4, len(ls) - 1)
                if 20 <= len(ls[i].strip()) <= 120
                and not ls[i].strip().startswith("#")]
        if not good:
            continue
        i = mc_rng.choice(good)
        prefix = "\n".join(ls[max(0, i - 12):i])
        answer = ls[i]
        distractors = mc_rng.sample(pool, 8)
        distractors = [d for d in distractors if d.strip() != answer.strip()][:3]
        if len(distractors) < 3 or len(prefix) < 80:
            continue
        choices = [answer] + distractors
        order = list(range(4))
        mc_rng.shuffle(order)
        items.append({
            "question": prefix,
            "choices": [choices[j] for j in order],
            "answer": order.index(0),
        })
    with open(out / "mc.jsonl", "w") as f:
        for it in items:
            f.write(json.dumps(it) + "\n")
    print(f"mc items: {len(items)}")
    print("DONE")


if __name__ == "__main__":
    main()

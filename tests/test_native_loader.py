"""C++ native data loader: build, parity with the Python path, threading."""

import json
import time

import numpy as np
import pytest

from apertis_llm_tpu.native import NativeTokenizerBatcher, get_native

native = get_native()
requires_native = pytest.mark.skipif(
    native is None, reason="native extension unavailable (no compiler?)")

VOCAB = {"<pad>": 0, "<bos>": 1, "<eos>": 2, "<unk>": 3,
         "the": 4, "cat": 5, "sat": 6, "on": 7, "mat": 8}


@requires_native
def test_encode_matches_python_dataset(tmp_path):
    from apertis_llm_tpu.training.datasets import ApertisPretrainDataset

    lines = [
        {"text": "the cat sat on the mat"},
        {"text": "unknownword the cat"},
        {"text": ""},
        {"text": "the " * 40},  # truncation
    ]
    path = tmp_path / "data.jsonl"
    path.write_text("\n".join(json.dumps(x) for x in lines))

    ds_native = ApertisPretrainDataset(str(path), VOCAB, 9, max_length=16)
    assert ds_native._native_arrays is not None

    import os

    os.environ["APERTIS_DISABLE_NATIVE"] = "1"
    try:
        import apertis_llm_tpu.native as nat

        nat._TRIED = False
        nat._NATIVE = None
        ds_python = ApertisPretrainDataset(str(path), VOCAB, 9, max_length=16)
        assert ds_python._native_arrays is None
    finally:
        del os.environ["APERTIS_DISABLE_NATIVE"]
        nat._TRIED = False
        nat._NATIVE = None

    for i in range(len(lines)):
        a, b = ds_native[i], ds_python[i]
        for key in ("input_ids", "attention_mask", "labels"):
            np.testing.assert_array_equal(a[key], b[key], err_msg=f"{i}/{key}")


@requires_native
def test_read_jsonl_field(tmp_path):
    path = tmp_path / "d.jsonl"
    path.write_text('\n'.join([
        '{"text": "hello world"}',
        '{"other": 1}',
        'not json',
        '{"text": "esc \\"quoted\\" and \\n newline"}',
    ]))
    batcher = NativeTokenizerBatcher(VOCAB, 0, 3, 9, 8)
    texts = batcher.read_texts(str(path))
    assert texts == ["hello world", 'esc "quoted" and \n newline']


@requires_native
def test_native_throughput(tmp_path):
    """The native path should beat the Python tokenizer comfortably."""
    from apertis_llm_tpu.training.datasets import ApertisPretrainDataset

    n = 2000
    text = "the cat sat on the mat " * 20
    path = tmp_path / "big.jsonl"
    path.write_text("\n".join(json.dumps({"text": text}) for _ in range(n)))

    # Best of two constructions: the first pays .so load + cold file cache,
    # and both can be slowed arbitrarily by a loaded host (the full suite
    # runs threads on every core) — the comparison below wants the
    # steady-state rate.
    native_time = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        ds = ApertisPretrainDataset(str(path), VOCAB, 9, max_length=128)
        native_time = min(native_time, time.perf_counter() - t0)
    assert ds._native_arrays is not None

    t0 = time.perf_counter()
    for i in range(200):
        ids = ds._tokenize(text)[:128]  # python path, per item
    python_time = (time.perf_counter() - t0) / 200 * n

    # Informative, not strict — wall-clock assertions flake under load (the
    # reference's timing tests had exactly this problem, SURVEY.md §4). The
    # generous bound only catches order-of-magnitude regressions.
    assert native_time < python_time * 10
    print(f"native: {native_time*1e3:.1f} ms for {n} items; "
          f"python est: {python_time*1e3:.1f} ms")

"""Native (C++) host-runtime components, self-bootstrapping.

``get_native()`` returns the compiled ``_apertis_native`` extension, building
it with the system compiler on first use (cached under the package dir).
Every consumer treats it as optional and falls back to pure Python, so the
framework works on hosts without a toolchain.
"""

from __future__ import annotations

import hashlib
import importlib.util
import logging
import os
import subprocess
import sysconfig
from pathlib import Path
from typing import Optional

logger = logging.getLogger(__name__)

_NATIVE = None
_TRIED = False


def _build(source: Path, out: Path) -> bool:
    include = sysconfig.get_paths()["include"]
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3", "-std=c++17", "-shared", "-fPIC",
        f"-I{include}",
        str(source), "-o", str(out),
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        logger.info("Native build unavailable (%s); using Python fallback.", e)
        return False
    if proc.returncode != 0:
        logger.warning("Native build failed:\n%s", proc.stderr[-2000:])
        return False
    return True


def get_native():
    """Return the _apertis_native module, or None if unavailable."""
    global _NATIVE, _TRIED
    if _TRIED:
        return _NATIVE
    _TRIED = True
    if os.environ.get("APERTIS_DISABLE_NATIVE"):
        return None
    here = Path(__file__).resolve().parent
    source = here / "loader.cpp"
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    # The build cache is keyed on the SOURCE CONTENT HASH (not mtimes), so a
    # fresh checkout or an edited loader.cpp always gets a matching binary;
    # binaries are never committed (see .gitignore).
    digest = hashlib.sha256(source.read_bytes()).hexdigest()[:12]
    out = here / f"_apertis_native-{digest}{suffix}"
    if not out.exists():
        for stale in here.glob(f"_apertis_native*{suffix}"):
            try:
                stale.unlink()
            except OSError:
                pass
        if not _build(source, out):
            return None
    try:
        spec = importlib.util.spec_from_file_location("_apertis_native", out)
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)  # type: ignore[union-attr]
        _NATIVE = module
        logger.info("Loaded native data loader (%s).", out.name)
    except Exception as e:
        logger.warning("Could not load native extension: %s", e)
        _NATIVE = None
    return _NATIVE


class NativeTokenizerBatcher:
    """Whitespace-vocab batch tokeniser backed by the C++ extension.

    Produces the same (input_ids, attention_mask, labels) arrays as
    ApertisPretrainDataset's Python path; ``available`` is False when the
    extension could not be built.
    """

    def __init__(self, vocab: dict, pad_id: int, unk_id: int,
                 model_vocab_size: int, max_length: int,
                 num_threads: Optional[int] = None):
        self._native = get_native()
        self.max_length = max_length
        self.num_threads = num_threads or min(8, os.cpu_count() or 1)
        if self._native is not None:
            self._tok = self._native.make_tokenizer(
                {str(k): int(v) for k, v in vocab.items()},
                pad_id, unk_id, model_vocab_size)

    @property
    def available(self) -> bool:
        return self._native is not None

    def read_texts(self, jsonl_path: str, field: str = "text"):
        return self._native.read_jsonl_field(str(jsonl_path), field)

    def encode_batch(self, texts):
        import numpy as np

        ids_b, mask_b, labels_b = self._native.encode_batch(
            self._tok, list(texts), self.max_length, self.num_threads)
        n = len(texts)
        shape = (n, self.max_length)
        return (np.frombuffer(ids_b, np.int32).reshape(shape),
                np.frombuffer(mask_b, np.int32).reshape(shape),
                np.frombuffer(labels_b, np.int32).reshape(shape))

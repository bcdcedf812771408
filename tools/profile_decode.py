"""Profile the decode loop on TPU and aggregate per-op device durations.

PROF_ARCH=ssm|moe selects the flagship family; PROF_TAG names the trace dir.
The trace captures a 64-token b256 greedy generation (no pixels keeps the
program small); the decode while-body ops are the bulk of events.
"""
import os, sys, time, glob, collections, re
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

ARCH = os.environ.get("PROF_ARCH", "ssm")   # ssm | moe | mha
TAG = os.environ.get("PROF_TAG", ARCH)
OUT = f"/tmp/prof_decode_{TAG}"
STEPS = int(os.environ.get("PROF_STEPS", "64"))

from apertis_llm_tpu.config import ApertisConfig
from apertis_llm_tpu.models.factory import calculate_model_dimensions
from apertis_llm_tpu.models.params import init_params
from apertis_llm_tpu.models.quantize import quantize_params
from apertis_llm_tpu.inference.engine import InferenceEngine

dims = calculate_model_dimensions("1.5B", 32000, use_expert_system=(ARCH == "moe"))
kw = dict(hidden_size=dims["hidden_size"],
          num_hidden_layers=dims["num_hidden_layers"],
          num_attention_heads=dims["num_attention_heads"],
          intermediate_size=dims["intermediate_size"])
if ARCH == "moe":
    kw.update(use_expert_system=True, num_experts=8, experts_per_token=2)
config = ApertisConfig(
    vocab_size=32000,
    attention_type="standard_mha" if ARCH == "mha" else "selective_ssm",
    use_flash_attention=(ARCH == "mha"), ssm_d_state=16,
    multimodal=False, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    max_position_embeddings=4096, dtype="bfloat16", param_dtype="bfloat16", **kw)
print("dims:", dims, flush=True)
t0 = time.perf_counter()
params = jax.jit(lambda r: init_params(r, config))(jax.random.PRNGKey(0))
params = jax.jit(quantize_params)(params)
jax.block_until_ready(params)
print(f"init {time.perf_counter()-t0:.0f}s arch={ARCH}", flush=True)
engine = InferenceEngine(config, params)

B = int(os.environ.get("PROF_BATCH", "64" if ARCH == "mha" else "256"))
LP = int(os.environ.get("PROF_PROMPT", "256" if ARCH == "mha" else "32"))
def prompt(seed):
    rr = np.random.default_rng(seed)
    return rr.integers(4, 32000, size=(B, LP)).astype(np.int32)

def gen(seed, n):
    t0 = time.perf_counter()
    engine.generate(prompt(seed), max_new_tokens=n, eos_token_id=(),
                    do_sample=False, rng=jax.random.PRNGKey(seed))
    return time.perf_counter() - t0

gen(0, STEPS)   # compile
ts = [gen(1 + i, STEPS) for i in range(3)]
print(f"gen{STEPS} warm: {[f'{t*1e3:.0f}' for t in ts]} ms", flush=True)

jax.profiler.start_trace(OUT)
gen(9, STEPS)
jax.profiler.stop_trace()
print("trace done", flush=True)

from tensorflow.tsl.profiler.protobuf import xplane_pb2
paths = glob.glob(OUT + "/**/*.xplane.pb", recursive=True)
for path in paths:
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        agg, cnt = collections.Counter(), collections.Counter()
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                agg[name] += ev.duration_ps / 1e9
                cnt[name] += 1
        total = sum(agg.values())
        print(f"== {plane.name}: total {total:.1f} ms, {sum(cnt.values())} events")
        kinds = collections.Counter()
        for name, ms in agg.items():
            m = re.match(r"%?([a-zA-Z_\-]+)", name)
            kinds[m.group(1) if m else name] += ms
        for k, ms in kinds.most_common(18):
            print(f"  KIND {ms:9.2f} ms  {k}")
        for name, ms in agg.most_common(45):
            print(f"  {ms:9.2f} ms  x{cnt[name]:5d}  {name[:150]}")

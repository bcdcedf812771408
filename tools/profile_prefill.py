"""Profile the 1.5B flagship prefill (TTFT program) on TPU and
aggregate device op durations from the xplane, grouping by op kind.
PROF_ARCH=ssm (default) | moe selects the family (r5: the MoE TTFT
campaign, VERDICT r4 item 4)."""
import os, sys, time, glob, collections, re
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

ARCH = os.environ.get("PROF_ARCH", "ssm")
TAG = os.environ.get("PROF_TAG", ARCH)
OUT = f"/tmp/prof_prefill_{TAG}"

from apertis_llm_tpu.config import ApertisConfig
from apertis_llm_tpu.models.factory import calculate_model_dimensions
from apertis_llm_tpu.models.params import init_params
from apertis_llm_tpu.models.quantize import quantize_params
from apertis_llm_tpu.inference.engine import InferenceEngine

dims = calculate_model_dimensions("1.5B", 32000,
                                  use_expert_system=(ARCH == "moe"))
kw = {}
if ARCH == "moe":
    kw.update(use_expert_system=True, num_experts=8, experts_per_token=2)
config = ApertisConfig(
    vocab_size=32000, attention_type="selective_ssm", ssm_d_state=16,
    multimodal=True, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    max_position_embeddings=4096, dtype="bfloat16", param_dtype="bfloat16",
    hidden_size=dims["hidden_size"], num_hidden_layers=dims["num_hidden_layers"],
    num_attention_heads=dims["num_attention_heads"],
    intermediate_size=dims["intermediate_size"], **kw)
print("dims:", dims, flush=True)
t0 = time.perf_counter()
params = jax.jit(lambda r: init_params(r, config))(jax.random.PRNGKey(0))
params = jax.jit(quantize_params)(params)
jax.block_until_ready(params)
print(f"init {time.perf_counter()-t0:.0f}s tag={TAG}", flush=True)
engine = InferenceEngine(config, params)

B = 256
def prompt(seed):
    rr = np.random.default_rng(seed)
    return rr.integers(4, 32000, size=(B, 32)).astype(np.int32)
r = np.random.default_rng(0)
pix_np = r.integers(0, 255, size=(B, config.image_size, config.image_size, 3)).astype(np.uint8)
pix = jax.device_put(pix_np)
_ = float(jnp.sum(pix.astype(jnp.float32)))

def ttft(seed):
    t0 = time.perf_counter()
    engine.generate(prompt(seed), pixel_values=pix, max_new_tokens=1,
                    eos_token_id=(), do_sample=False,
                    rng=jax.random.PRNGKey(seed))
    return time.perf_counter() - t0

ttft(0)  # compile
ts = [ttft(1 + i) for i in range(3)]
print(f"ttft warm: {[f'{t*1e3:.0f}' for t in ts]} ms", flush=True)

jax.profiler.start_trace(OUT)
ttft(9)
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
        # grouped by coarse kind
        kinds = collections.Counter()
        for name, ms in agg.items():
            m = re.match(r"%?([a-zA-Z_\-]+)", name)
            kinds[m.group(1) if m else name] += ms
        for k, ms in kinds.most_common(15):
            print(f"  KIND {ms:9.2f} ms  {k}")
        for name, ms in agg.most_common(35):
            print(f"  {ms:9.2f} ms  x{cnt[name]:5d}  {name[:130]}")

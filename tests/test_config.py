"""Config semantics + sizing-factory parity with the reference."""

import json

import pytest

from tests.reference_oracle import load_reference

from apertis_llm_tpu.config import ApertisConfig
from apertis_llm_tpu.models.factory import (
    build_model_config,
    calculate_model_dimensions,
    estimate_model_parameters,
    parse_param_count,
)

core = load_reference()
requires_ref = pytest.mark.skipif(core is None, reason="reference oracle unavailable")


def test_ssm_derived_dims():
    cfg = ApertisConfig(attention_type="selective_ssm",
                        num_attention_heads=8, ssm_d_state=16, hidden_size=512)
    assert cfg.ssm_d_inner == 8 * 16
    assert cfg.ssm_dt_rank == 32  # ceil(512 / 16)


def test_selective_linear_alias():
    cfg = ApertisConfig(attention_type="selective_linear", hidden_size=64,
                        num_attention_heads=4)
    assert cfg.attention_type == "selective_ssm"


def test_moe_zeroing_when_disabled():
    cfg = ApertisConfig(use_expert_system=False, num_experts=8, experts_per_token=2)
    assert cfg.num_experts == 0
    assert cfg.experts_per_token == 0


def test_experts_per_token_clamped():
    cfg = ApertisConfig(use_expert_system=True, num_experts=2, experts_per_token=5)
    assert cfg.experts_per_token == 2


def test_json_round_trip(tmp_path):
    cfg = ApertisConfig(hidden_size=128, num_attention_heads=4,
                        attention_type="selective_ssm", use_swiglu=True)
    cfg.save_pretrained(tmp_path)
    loaded = ApertisConfig.from_pretrained(tmp_path)
    assert loaded.to_dict() == cfg.to_dict()


def test_reference_config_json_loads(tmp_path):
    """A config.json written by the reference loads unchanged."""
    ref_style = {
        "vocab_size": 1000, "hidden_size": 256, "num_hidden_layers": 4,
        "num_attention_heads": 4, "intermediate_size": 1024,
        "attention_type": "selective_ssm", "ssm_d_state": 16,
        "ssm_dt_rank": 16, "ssm_d_inner": 64, "ssm_conv_kernel": 4,
        "use_expert_system": True, "num_experts": 4, "experts_per_token": 2,
        "unknown_future_key": 123,
    }
    p = tmp_path / "config.json"
    p.write_text(json.dumps(ref_style))
    cfg = ApertisConfig.from_pretrained(p)
    assert cfg.hidden_size == 256
    assert cfg.ssm_d_inner == 4 * 16  # derived, overrides stored value
    assert cfg.num_experts == 4


def test_parse_param_count():
    assert parse_param_count("125M") == 125_000_000
    assert parse_param_count("1.5B") == 1_500_000_000
    assert parse_param_count("900K") == 900_000
    assert parse_param_count(42) == 42
    with pytest.raises(ValueError):
        parse_param_count("abc")


@requires_ref
@pytest.mark.parametrize("target,moe", [("125M", False), ("350M", False), ("1.5B", False),
                                        ("125M", True)])
def test_dimension_search_matches_reference(target, moe):
    ours = calculate_model_dimensions(target, vocab_size=32000, use_expert_system=moe)
    ref = core.calculate_model_dimensions(target, vocab_size=32000, use_expert_system=moe)
    for key in ("hidden_size", "num_hidden_layers", "num_attention_heads",
                "intermediate_size", "calculated_params"):
        assert ours[key] == ref[key], f"{target} moe={moe}: {key}"


@requires_ref
def test_estimate_matches_reference():
    kwargs = dict(vocab_size=5000, hidden_size=256, num_hidden_layers=4,
                  num_attention_heads=4, intermediate_size=1024)
    ours = estimate_model_parameters(ApertisConfig(**kwargs))
    ref = core.estimate_model_parameters(core.ApertisConfig(**kwargs))
    assert ours == ref


def test_build_model_config():
    cfg = build_model_config("50M", vocab_size_override=1000,
                             attention_type_override="selective_ssm")
    assert cfg.vocab_size == 1000
    assert cfg.attention_type == "selective_ssm"
    assert cfg.hidden_size % cfg.num_attention_heads == 0

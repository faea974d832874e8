"""Unit coverage for the real-asset parity gate (tools/parity_gate.py):
reference stdout parsing, expected-trace loading, tolerance comparison,
and the golden flag sets."""

import json
import os
import sys

import pytest

sys.path.insert(0, "/root/repo/tools")
import parity_gate  # noqa: E402


REF_OUT = """
************* Training arguments *************
...
Overall continual accuracies:  [82.5, 76.61, 71.27, 67.15, 63.74, 61.37, 59.05, 57.28, 55.6]
Novel only incremental:  [58.4, 52.6, 49.33, 47.1, 46.02, 43.93, 42.51, 41.46]
Base only incremental:  [78.05, 74.35, 72.0, 70.2, 69.35, 68.0, 67.2, 66.3]
val_acc_novel: 47.6688, std: 0.0000, time: 128.0
"""


def test_parse_reference_out():
    traces = parity_gate.parse_reference_out(REF_OUT)
    assert len(traces["overall"]) == 9
    assert len(traces["novel"]) == 8
    assert len(traces["base"]) == 8
    assert traces["overall"][0] == 82.5
    assert traces["novel"][-1] == 41.46


def test_parse_reference_out_missing_trace():
    with pytest.raises(ValueError, match="Novel only"):
        parity_gate.parse_reference_out("Overall continual accuracies: [1.0]")


def test_load_expected_json_and_out(tmp_path):
    d = {"overall": [1, 2], "novel": [3], "base": [4]}
    with open(tmp_path / "subspace_reg_seed_1.json", "w") as f:
        json.dump(d, f)
    got = parity_gate.load_expected(str(tmp_path), "subspace_reg", 1)
    assert got["overall"] == [1.0, 2.0]

    with open(tmp_path / "fine_tune_seed_2.out", "w") as f:
        f.write(REF_OUT)
    got = parity_gate.load_expected(str(tmp_path), "fine_tune", 2)
    assert got["base"][0] == 78.05

    with pytest.raises(FileNotFoundError):
        parity_gate.load_expected(str(tmp_path), "fine_tune", 9)


def test_compare_tolerance():
    ours = {"overall": [80.0, 70.0], "novel": [50.0], "base": [75.0]}
    ref = {"overall": [80.3, 69.8], "novel": [50.49], "base": [75.0]}
    ok, rows = parity_gate.compare(ours, ref, tolerance=0.5)
    assert ok
    ref_bad = {"overall": [80.3, 69.8], "novel": [50.51], "base": [75.0]}
    ok, rows = parity_gate.compare(ours, ref_bad, tolerance=0.5)
    assert not ok
    bad_len = {"overall": [80.3], "novel": [50.0], "base": [75.0]}
    ok, rows = parity_gate.compare(ours, bad_len, tolerance=0.5)
    assert not ok and any("error" in r for r in rows)


def test_golden_configs_cover_all_eval_scripts():
    """The gate's configs mirror scripts/continual/*.sh (minus pretraining,
    which has no eval trace to diff)."""
    scripts = {f[:-3] for f in os.listdir("/root/repo/scripts/continual")
               if f.endswith(".sh")} - {"run_backbone"}
    assert scripts == set(parity_gate.CONFIGS)
    # hyperparameters from the reference's slurm scripts
    assert "--attraction_override" in parity_gate.CONFIGS["subspace_reg"]
    assert "distance2subspace" in parity_gate.CONFIGS["subspace_reg"]
    assert "--glove" in parity_gate.CONFIGS["semantic_subspace_reg"]
    sem = parity_gate.CONFIGS["semantic_subspace_reg"]
    assert sem[sem.index("--temperature") + 1] == "3.0"
    lm = parity_gate.CONFIGS["linear_mapping"]
    assert lm[lm.index("--label_pull") + 1] == "0.1"
    assert "mapping_linear_label2image" in lm
    # the mapping is trained on the 300-d GloVe slice (learn_mapping.py);
    # eval must slice to match (reference slurm_linear_mapping.sh:53)
    assert "--glove" in lm


def test_mapping_dim_mismatch_raises_helpfully():
    """500-d embeds against a 300-d-trained LinearMap must fail fast with a
    message pointing at --glove, not a cryptic gufunc error."""
    import jax.numpy as jnp
    import numpy as np
    from subspace_reg_tpu.models import lang_puller as lp
    state = lp.LangPullerState(
        base_embeds=jnp.zeros((4, 500)), novel_embeds=jnp.zeros((2, 500)),
        mapping_weight=jnp.zeros((8, 300)), mapping_bias=jnp.zeros((8,)))
    with pytest.raises(ValueError, match="--glove"):
        lp.pullers_host_f64(state, np.zeros((4, 8), np.float32))
    with pytest.raises(ValueError, match="--glove"):
        lp.pullers(state, jnp.zeros((4, 8)))

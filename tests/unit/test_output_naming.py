"""Output naming: decode-recipe tags, graph tags, cache-suffix candidates,
per-step intermediates (reference output_naming.py:229-709)."""

from pytorch_connectomics_tpu.runtime.output_naming import (
    cache_candidates,
    decoded_filename,
    format_decode_graph_tag,
    format_decode_step_tag,
    format_decode_tag,
    head_filenames,
    intermediate_decode_filename,
    prediction_filename,
    prediction_tag,
    tuned_params_candidates,
)


def test_decode_step_tag_tokens():
    step = {"name": "waterz", "kwargs": {"threshold": 0.5, "min_size": 100}}
    assert format_decode_step_tag(step) == "waterz_100-0.5"
    # decode_ prefix stripped, bools/None encoded, floats compact
    step = {"name": "decode_affinity_cc", "kwargs": {"threshold": 0.75, "use_mask": True, "opt": None}}
    assert format_decode_step_tag(step) == "affinity_cc_none-0.75-true"  # key-sorted
    # explicit tag wins; path-like kwargs ignored
    step = {"name": "waterz", "kwargs": {"tag": "my run!", "threshold": 0.5}}
    assert format_decode_step_tag(step) == "my-run"
    step = {"name": "waterz", "kwargs": {"report_dir": "/tmp/x", "threshold": 0.5}}
    assert format_decode_step_tag(step) == "waterz_0.5"


def test_decode_tag_chain_and_graph():
    cfg = {"steps": [
        {"name": "waterz", "kwargs": {"threshold": 0.4}},
        {"name": "decode_shape_smooth", "kwargs": {}},
    ]}
    assert format_decode_tag(cfg) == "waterz_0.4__shape_smooth"
    graph = {
        "nodes": {
            "seg": {"op": "waterz", "kwargs": {"threshold": 0.4}, "inputs": ["prediction"]},
        },
        "output": "seg",
    }
    t = format_decode_graph_tag(graph)
    assert t.startswith("graph-seg-waterz_0.4-from-prediction")
    assert t.endswith("__out-seg")
    assert format_decode_tag({"graph": graph}) == t


def test_decoded_filename_variants():
    assert decoded_filename("vol", "ck") == "vol_ck_decoded.h5"
    cfg = {"steps": [{"name": "waterz", "kwargs": {"threshold": 0.4}}]}
    assert decoded_filename("vol", "ck", decoding_cfg=cfg) == "vol_ck_decoded_waterz_0.4.h5"
    cfg2 = dict(cfg, save_suffix="final v2")
    assert decoded_filename("vol", "ck", decoding_cfg=cfg2) == "vol_ck_decoded_final-v2.h5"


def test_cache_candidates_most_specific_first():
    tag = prediction_tag("ckpt/best.ckpt", tta_passes=8, head="aff", channels=[0, 1])
    cands = cache_candidates(
        "vol", tag, checkpoint="ckpt/best.ckpt", tta_passes=8, head="aff", channels=[0, 1]
    )
    assert cands[0] == prediction_filename("vol", tag)
    # progressively less decorated variants present
    assert prediction_filename("vol", prediction_tag("ckpt/best.ckpt", 8, "aff")) in cands
    assert prediction_filename("vol", prediction_tag("ckpt/best.ckpt")) in cands
    assert cands[-1] == "vol_prediction.h5"
    assert len(cands) == len(set(cands))  # deduped


def test_intermediate_and_head_names():
    step = {"name": "waterz", "kwargs": {"threshold": 0.4}}
    assert (
        intermediate_decode_filename("vol", "ck", step)
        == "vol_ck_decoding_waterz_0.4.h5"
    )
    names = head_filenames("vol", "ck", ["aff", "sem"])
    assert names["aff"] == "vol_ck_head_aff_prediction.h5"


def test_tuned_params_candidates():
    cands = tuned_params_candidates("ck_tta_x8", checkpoint="runs/best.ckpt")
    assert cands[0] == "ck_tta_x8_best_params.yaml"
    assert "best_best_params.yaml" in cands
    assert cands[-1] == "best_params.yaml"

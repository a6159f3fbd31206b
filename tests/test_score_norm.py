"""Ref/hyp normalization for scoring: <space> units render identically on
both sides (the reference scores RAW ref text against the rendered
hypothesis, liteasr/infer.py:54-60, miscounting every <space> as an edit)."""

import types


def _task(delimiter=" "):
    from liteasr_tpu.tasks.asr import ASRTask

    t = ASRTask.__new__(ASRTask)
    t.cfg = types.SimpleNamespace(delimiter=delimiter)
    return t


def test_normalize_ref_renders_space_units():
    t = _task()
    assert t.normalize_ref("oo <space> dd <space> x y") == "oo   dd   x y"


def test_normalize_ref_char_level_passthrough():
    t = _task(delimiter=None)
    assert t.normalize_ref("abc<space>d") == "abc<space>d"


def test_normalized_ref_matches_rendered_hyp_tokens():
    # after normalization, token streams (empty fields dropped, as
    # tools/score_ci.py does) are identical for a perfect hypothesis
    t = _task()
    ref = t.normalize_ref("oo <space> dd")
    hyp = "oo   dd"  # ids_to_text rendering of [oo, <space>, dd]
    assert [x for x in ref.split(" ") if x] == [x for x in hyp.split(" ") if x]
    assert ref == hyp

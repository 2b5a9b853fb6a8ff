"""End-to-end CLI tests with scripted backends: artifacts, batch mode, eval."""

import json

import pytest

from handwritten_ocr_tpu.cli import eval_final, transcribe
from handwritten_ocr_tpu.engine.fakes import ScriptedOCRBackend, ScriptedReasoningBackend
from handwritten_ocr_tpu.graph import OCRPipeline


def make_pipeline(ocr_text="hello world", confidence=95):
    ocr = ScriptedOCRBackend(by_key={
        "deskew+high_contrast+binarize": ocr_text,
        "high_contrast+binarize": ocr_text,
    })
    responses = [{
        "overall_confidence": confidence, "verdict": "accept",
        "segments": [], "reasoning": "fine",
    }] * 100
    return OCRPipeline(ocr, ScriptedReasoningBackend(responses), quiet=True)


def write_image(path):
    path.write_bytes(b"fake-image-bytes")
    return path


def test_single_image_artifacts(tmp_path, capsys):
    img = write_image(tmp_path / "page1.png")
    gt = tmp_path / "page1.md"
    gt.write_text("## Ground Truth\nhello world\n")

    transcribe.main(
        [str(img), "--ground-truth", str(gt), "--quiet"],
        pipeline=make_pipeline(),
    )

    # Artifacts land next to the input (default output dir for files).
    assert (tmp_path / "page1_transcription.txt").read_text() == "hello world"
    trace = json.loads((tmp_path / "page1_trace.json").read_text())
    assert [e["action"] for e in trace] == [
        "preprocess", "ocr", "preprocess", "ocr", "compare", "merge",
        "critique", "accept",
    ]
    summary = (tmp_path / "page1_trace_summary.txt").read_text()
    assert "DONE — 1 iterations" in summary
    ev = json.loads((tmp_path / "page1_eval.json").read_text())
    assert ev["pipeline_status"] == "completed"
    assert ev["iterations"] == 1
    assert ev["final_confidence"] == 95
    assert ev["tier1_raw_vs_gt"]["cer"] == 0.0
    assert ev["tier1_raw_vs_gt"]["exact_match"] is True


def test_batch_mode_with_gt_dir(tmp_path):
    src = tmp_path / "pages"
    src.mkdir()
    for name in ("b.png", "a.jpg", "notes.txt"):  # txt must be ignored
        write_image(src / name)
    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    (gt_dir / "a.md").write_text("## Ground Truth\nhello world")

    out = tmp_path / "results"
    transcribe.main(
        [str(src), "--output-dir", str(out), "--ground-truth-dir", str(gt_dir),
         "--quiet"],
        pipeline=make_pipeline(),
    )

    assert (out / "a_transcription.txt").exists()
    assert (out / "b_transcription.txt").exists()
    assert not (out / "notes_transcription.txt").exists()
    a_eval = json.loads((out / "a_eval.json").read_text())
    assert "tier1_raw_vs_gt" in a_eval       # GT matched by stem
    b_eval = json.loads((out / "b_eval.json").read_text())
    assert "tier1_raw_vs_gt" not in b_eval   # no GT for b


def test_batch_default_output_dir_is_results(tmp_path):
    src = tmp_path / "pages"
    src.mkdir()
    write_image(src / "x.png")
    transcribe.main([str(src), "--quiet"], pipeline=make_pipeline())
    assert (src / "results" / "x_transcription.txt").exists()


def test_skip_existing(tmp_path):
    src = tmp_path / "pages"
    src.mkdir()
    write_image(src / "x.png")
    out = src / "results"
    out.mkdir()
    (out / "x_transcription.txt").write_text("already done")

    transcribe.main([str(src), "--skip-existing", "--quiet"],
                    pipeline=make_pipeline())
    assert (out / "x_transcription.txt").read_text() == "already done"


def test_missing_input_exits(tmp_path):
    with pytest.raises(SystemExit):
        transcribe.main([str(tmp_path / "nope.png")], pipeline=make_pipeline())


def test_accept_threshold_flag(tmp_path):
    img = write_image(tmp_path / "p.png")
    # Confidence 60 with threshold 50 → accepted on iteration 1.
    transcribe.main([str(img), "--accept-threshold", "50", "--quiet"],
                    pipeline=make_pipeline(confidence=60))
    ev = json.loads((tmp_path / "p_eval.json").read_text())
    assert ev["final_confidence"] == 60
    assert ev["pipeline_status"] == "completed"


# ── eval_final CLI ──────────────────────────────────────────────────

def test_eval_single_file(tmp_path, capsys):
    txt = tmp_path / "x_transcription.txt"
    txt.write_text("the quick brown fox")
    gt = tmp_path / "x.md"
    gt.write_text("## Ground Truth\nthe quick brown fox")

    out_json = tmp_path / "eval.json"
    eval_final.main([str(txt), "--ground-truth", str(gt),
                     "--output", str(out_json)])
    printed = capsys.readouterr().out
    assert "CER:       0.00%" in printed
    result = json.loads(out_json.read_text())
    assert result["tier1_raw_vs_gt"]["exact_match"] is True
    assert result["file"] == str(txt)


def test_eval_batch_with_summary(tmp_path, capsys):
    res = tmp_path / "results"
    res.mkdir()
    (res / "a_transcription.txt").write_text("hello world")
    (res / "b_transcription.txt").write_text("completely different words here")
    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    (gt_dir / "a.md").write_text("## Ground Truth\nhello world")
    (gt_dir / "b.txt").write_text("hello world")

    eval_final.main([str(res), "--ground-truth-dir", str(gt_dir)])
    printed = capsys.readouterr().out
    assert "Batch Summary (2 files with GT)" in printed
    assert "Avg CER:" in printed


def test_eval_batch_fallback_to_plain_txt(tmp_path, capsys):
    res = tmp_path / "results"
    res.mkdir()
    (res / "plain.txt").write_text("some text")
    eval_final.main([str(res)])
    assert "Evaluating 1 files" in capsys.readouterr().out


def test_eval_missing_input_exits(tmp_path):
    with pytest.raises(SystemExit):
        eval_final.main([str(tmp_path / "missing.txt")])


def test_lockstep_batch_mode(tmp_path):
    src = tmp_path / "pages"
    src.mkdir()
    for name in ("a.png", "b.png"):
        write_image(src / name)
    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    (gt_dir / "a.md").write_text("## Ground Truth\nhello world")

    out = tmp_path / "results"
    transcribe.main(
        [str(src), "--output-dir", str(out), "--ground-truth-dir", str(gt_dir),
         "--lockstep", "--quiet"],
        pipeline=make_pipeline(),
    )
    for stem in ("a", "b"):
        assert (out / f"{stem}_transcription.txt").read_text() == "hello world"
        trace = json.loads((out / f"{stem}_trace.json").read_text())
        assert trace[-1]["action"] == "accept"
    a_eval = json.loads((out / "a_eval.json").read_text())
    assert a_eval["tier1_raw_vs_gt"]["exact_match"] is True

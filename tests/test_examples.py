"""The examples/ scripts must stay runnable — they are the migration
documentation a reference user actually executes."""

import pytest
import subprocess
import sys


def _run(script: str) -> str:
    out = subprocess.run(
        [sys.executable, script, "/root/testdata/sf0.001"],
        capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_wordcount_example():
    lines = [l for l in _run("examples/wordcount.py").splitlines()
             if "\t" in l]
    assert len(lines) == 10
    counts = [int(l.split("\t")[1]) for l in lines]
    assert counts == sorted(counts, reverse=True)


@pytest.mark.heavy
def test_llm_pipeline_example():
    out = _run("examples/llm_pipeline.py")
    budget = [l for l in out.splitlines() if "\t" in l]
    stages = [l for l in out.splitlines() if l.startswith("# ")]
    assert budget, out
    assert len(stages) == 16   # +3: code routing, C4, LM quality
    # the r10 curation additions report without filtering the funnel
    splits = [l for l in out.splitlines() if l.startswith("split\t")]
    assert {l.split("\t")[1] for l in splits} == {"train", "val", "test"}
    novelty = [l for l in out.splitlines() if l.startswith("novelty\t")]
    assert novelty and all(0 <= float(l.split("\t")[2]) <= 1
                           for l in novelty)
    # survivor counts (all but the trailing chunk- and sequence-count
    # stages, which may exceed the doc funnel) are monotonically
    # non-increasing through the funnel
    counts = [int(s.rsplit(": ", 1)[1]) for s in stages[:-2]]
    assert counts == sorted(counts, reverse=True)
    assert counts[-1] > 0
    assert all(int(s.rsplit(": ", 1)[1]) > 0 for s in stages[-2:])
    assert any(l.startswith("mix\t") for l in out.splitlines())


def test_url_counts_example():
    out = _run("examples/url_counts.py")
    assert "wrote " in out
    lines = [l for l in out.splitlines() if "\t" in l]
    assert len(lines) == 5


def test_analytics_tour_example():
    out = _run("examples/analytics_tour.py")
    lines = {l.split("\t")[0]: l for l in out.splitlines() if "\t" in l}
    for stage in ("rollup", "retention", "funnel", "paths",
                  "percentiles", "winsorize", "anomalies", "pattern",
                  "scd2", "gapfill"):
        assert stage in lines, (stage, out[-1500:])
    assert int(lines["funnel"].split("\t")[1].split()[0]) > 0


def test_serving_table_example():
    out = _run("examples/serving_table.py")
    lines = {l.split("\t")[0]: l for l in out.splitlines() if "\t" in l}
    for stage in ("v1", "v2", "v3", "diff", "race", "vacuum"):
        assert stage in lines, (stage, out[-1500:])
    assert "failed fast" in lines["race"]
    assert "UNEXPECTED" not in out
    # the initial row count survives every stage
    n0 = lines["v1"].split(": ")[1].split()[0]
    assert lines["vacuum"].endswith(f"latest reads {int(n0) - 1}") or \
        lines["vacuum"].endswith(f"latest reads {n0}")


def test_web_ingest_runs_and_reports():
    out = _run("examples/web_ingest.py")
    # the duplicate crawls (every ~tenth page twice) must collapse:
    # survivors < warc records, and decontam can only shrink further
    import re
    m = re.search(r"\{[^}]*'after_decontam': (\d+)[^}]*"
                  r"'after_dedup': (\d+)[^}]*"
                  r"'warc_records': (\d+)[^}]*\}", out)
    assert m, out[-1500:]
    decon, dedup, recs = map(int, m.groups())
    assert recs > dedup >= decon > 0
    assert "corpus.test" in out


def test_media_tour_example():
    out = _run("examples/media_tour.py")
    lines = {}
    for l in out.splitlines():
        if "\t" in l:
            lines.setdefault(l.split("\t")[0], []).append(l)
    assert len(lines.get("corpus", [])) == 12         # all twelve formats
    dec = lines["decode"][0]
    assert "images 50" in dec and "audio 10" in dec
    fr = {l.split("\t")[1]: int(l.split("\t")[2]) for l in lines["frames"]}
    assert fr == {"gif": 30, "mp4_mjpeg": 20}         # 3 and 2 per blob
    assert lines["resize"][0].startswith("resize\t30 rasters")
    audio = lines["audio"][0]
    # wav + raw-PCM-MP4 + ADPCM-MP4 + FLAC converge on one relation
    assert "40 clips" in audio and "40 segments" in audio
    pdf = lines["pdf"][0]                 # two pages per pdf doc
    assert pdf.startswith("pdf\t20 pages")

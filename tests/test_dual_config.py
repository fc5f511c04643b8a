"""Dual-config operator matrix — the reference runs every operator under
both the Local and Bigmachine.Test executors and compares results
(slice_test.go:64-103); partitioning/serialization assumptions are the
class of bug this catches. The Spark analog: the same query battery on
local[1] vs local[32], Arrow transport on vs off (Arrow OFF forces the
pickle row path through pandas UDFs; fallback is disabled so a config
can't silently switch paths). Results must be identical row sets."""

import json
import os
import subprocess
import sys

import pytest

RUNNER = os.path.join(os.path.dirname(__file__), "dual_config_runner.py")

CONFIGS = [
    ("local[32]", "on"),   # the suite's default shape
    ("local[1]", "on"),    # single shard: partitioning assumptions
    ("local[32]", "off"),  # pickle transport: Arrow-batch assumptions
]


def _run(master: str, arrow: str, sf_dir: str) -> dict:
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, RUNNER, master, arrow, sf_dir],
        capture_output=True, text=True, timeout=1500, env=env)
    assert out.returncode == 0, out.stderr[-3000:]
    line = [ln for ln in out.stdout.splitlines()
            if ln.startswith("DUALCFG:")]
    assert line, out.stdout[-2000:] + out.stderr[-2000:]
    return json.loads(line[-1][len("DUALCFG:"):])


@pytest.mark.slow
@pytest.mark.heavy
def test_operator_battery_is_config_invariant(sf_dir):
    results = {cfg: _run(*cfg, sf_dir) for cfg in CONFIGS}
    base_cfg = CONFIGS[0]
    base = results[base_cfg]
    for cfg in CONFIGS[1:]:
        got = results[cfg]
        assert got.keys() == base.keys()
        for name in base:
            assert got[name]["cols"] == base[name]["cols"], \
                f"{name}: columns differ under {cfg}"
            if got[name]["rows"] != base[name]["rows"]:
                nb, ng = len(base[name]["rows"]), len(got[name]["rows"])
                diff = [r for r in got[name]["rows"]
                        if r not in base[name]["rows"]][:3]
                raise AssertionError(
                    f"{name}: rows differ under {cfg} vs {base_cfg} "
                    f"({nb} vs {ng} rows; first-only-in-{cfg}: {diff})")

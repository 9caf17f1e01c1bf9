"""bench.py artifact hygiene: the driver parses ONE JSON line from stdout.
Round 4's BENCH artifact was `parsed: null` because a throughput-matrix entry
embedded a multi-KB ANSI-laden libtpu log as its error string — these guards
keep every string in the result short, control-character-free, and the whole
line `json.loads`-round-trippable."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_short_err_is_one_clean_line():
    nasty = Exception(
        "INVALID_ARGUMENT: first line\n"
        "\x1b[2m2026-08-19T11:23:02Z\x1b[0m \x1b[32mINFO\x1b[0m axon log\n"
        + "x" * 5000)
    s = bench._short_err(nasty)
    assert "\n" not in s and "\x1b" not in s
    assert len(s) < 260
    assert s.startswith("error: Exception:")


def test_sanitize_result_always_parses():
    obj = {
        "metric": "m",
        "value": 1.0,
        "nan": float("nan"),
        "inf": float("inf"),
        "extra": {
            "matrix": {"b4_xla": "error: \x1b[31mred\x1b[0m\nline2\t" + "y" * 1000},
            "list": [1, "ok\x00null-byte"],
        },
    }
    line = json.dumps(bench._sanitize(obj))
    back = json.loads(line)
    assert back["nan"] is None and back["inf"] is None
    s = back["extra"]["matrix"]["b4_xla"]
    assert "\x1b" not in s and "\n" not in s and "\x00" not in s
    assert len(s) <= 300

#!/usr/bin/env python3
"""Unit test for tools/bench_diff.py — exercises every artifact shape the
tool claims to read, including the driver's FRONT-truncated tail (the shape
that broke the round-11 version). Run: python3 tools/test_bench_diff.py
"""
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
TOOL = os.path.join(HERE, "bench_diff.py")


def write(tmp, name, obj):
    p = os.path.join(tmp, name)
    with open(p, "w") as f:
        json.dump(obj, f)
    return p


def run(old, new, *extra):
    return subprocess.run(
        [sys.executable, TOOL, old, new, *extra],
        capture_output=True, text=True)


def main():
    with tempfile.TemporaryDirectory() as tmp:
        # repo shape: plain {"queries": {...}, "value": total}
        repo = write(tmp, "repo.json", {
            "metric": "bench", "value": 3.0, "unit": "sec",
            "queries": {"q_a": 1.0, "q_b": 2.0}, "sf": 0.1})

        # driver wrapper, intact tail (marker present, map closed)
        intact_line = ('{"metric":"bench","value":3.5,"unit":"sec",'
                       '"queries":{"q_a":1.1,"q_b":2.4},"sf":0.1,'
                       '"errors":[]}')
        intact = write(tmp, "intact.json", {"tail": intact_line, "parsed": None})

        # driver wrapper, FRONT-truncated tail: the cut lands mid-key, the
        # '"queries":{' marker and the total are gone (= BENCH_r10/r11 shape)
        torn = write(tmp, "torn.json", {
            "tail": 'edia_x":9.9,"q_a":1.2,"q_b":2.2,"q_c":0.5},'
                    '"errors":[],"sf":0.1}', "parsed": None})

        # driver wrapper with a non-null parsed object (preferred source)
        parsed = write(tmp, "parsed.json", {
            "tail": "garbage", "parsed": {
                "value": 3.1, "queries": {"q_a": 1.05, "q_b": 2.05}}})

        # truncated AFTER the marker but before the map closes
        open_map = write(tmp, "open.json", {
            "tail": '{"metric":"bench","value":9.0,"unit":"sec",'
                    '"queries":{"q_a":1.3,"q_b":2.'})

        r = run(repo, intact)
        assert "shared queries: 2" in r.stdout, r.stdout
        assert r.returncode == 0, (r.returncode, r.stdout, r.stderr)

        r = run(repo, torn)
        assert "front-truncated" in r.stdout, r.stdout
        assert "recovered 3 queries" in r.stdout, r.stdout
        assert "shared queries: 2" in r.stdout and "added: 1" in r.stdout, r.stdout
        # torn first key must NOT leak in as a query
        assert "edia_x" not in r.stdout.replace("added: 1", ""), r.stdout

        r = run(repo, parsed)
        assert "shared queries: 2" in r.stdout, r.stdout

        r = run(repo, open_map)
        assert "recovered 1 queries" in r.stdout, r.stdout

        # scientific-notation times (sub-ms erroring query) must be SKIPPED
        # in the pair-scan, never torn to their mantissa (8.7E-4 -> 8.7s
        # would fabricate a phantom regression); trailing torn numbers too
        sci = write(tmp, "sci.json", {
            "tail": 'x":9.9,"q_bad":8.7E-4,"q_a":1.0,"q_b":2.0,"q_cut":3.'})
        r = run(repo, sci)
        assert "recovered 2 queries" in r.stdout, r.stdout
        assert "q_bad" not in r.stdout and "q_cut" not in r.stdout, r.stdout
        assert r.returncode == 0, (r.returncode, r.stdout)

        # regression detection still fires (q_b 2.0 -> 4.0 = 2x, abs 2.0s)
        slow = write(tmp, "slow.json", {
            "queries": {"q_a": 1.0, "q_b": 4.0}, "value": 5.0})
        r = run(repo, slow)
        assert r.returncode == 1 and "REGRESSION" in r.stdout, r.stdout

        # r13+ median maps: when BOTH sides carry queries_median the diff
        # runs on it (q_b median 2.0 -> 2.1 = no regression even though the
        # min map says 2.0 -> 4.0), and one-sided median falls back to min
        med_old = write(tmp, "med_old.json", {
            "queries": {"q_a": 1.0, "q_b": 2.0}, "value": 3.0,
            "queries_median": {"q_a": 1.1, "q_b": 2.0}})
        med_new = write(tmp, "med_new.json", {
            "queries": {"q_a": 1.0, "q_b": 4.0}, "value": 5.0,
            "queries_median": {"q_a": 1.1, "q_b": 2.1}})
        r = run(med_old, med_new)
        assert "stat: median-of-3" in r.stdout, r.stdout
        assert r.returncode == 0, (r.returncode, r.stdout)
        r = run(repo, med_new)
        assert "stat: min-of-3" in r.stdout, r.stdout
        assert r.returncode == 1 and "REGRESSION" in r.stdout, r.stdout

        # intact driver tail carrying both maps: brace-match must return the
        # MIN map and the median map must parse from its own marker
        both_line = ('{"metric":"bench","value":3.5,"unit":"sec",'
                     '"queries":{"q_a":1.0,"q_b":4.0},'
                     '"queries_median":{"q_a":1.1,"q_b":2.1},'
                     '"errors":{},"sf":0.1}')
        both = write(tmp, "both.json", {"tail": both_line, "parsed": None})
        r = run(med_old, both)
        assert "stat: median-of-3" in r.stdout, r.stdout
        assert r.returncode == 0, (r.returncode, r.stdout)

        # front-truncated tail WITH a median map: the pair-scan must not let
        # median pairs shadow the min map's, and median diffing is off
        torn_med = write(tmp, "torn_med.json", {
            "tail": 'x":9.9,"q_a":1.2,"q_b":2.2},'
                    '"queries_median":{"q_a":8.8,"q_b":8.8},'
                    '"errors":{},"sf":0.1}', "parsed": None})
        r = run(repo, torn_med)
        assert "recovered 2 queries" in r.stdout, r.stdout
        assert "8.8" not in r.stdout, r.stdout

    print("bench_diff: all shapes OK")


if __name__ == "__main__":
    main()

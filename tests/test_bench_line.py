"""The driver parses bench.py's headline JSON from the LAST 2000 chars
of stdout — round 4's line outgrew that window (per-query pass-2 detail
inlined) and BENCH_r04 recorded parsed=null. Pin the budget: a line
built from every benched query name with worst-case-width values must
stay under 1900 chars, so adding a bench set that would overflow the
window fails here instead of silently voiding a round's numbers."""

import json

import bench


def test_headline_json_line_fits_driver_tail_window():
    names = bench.CORE + bench.NEW + bench.R4 + bench.R5 + bench.R6 + bench.R7
    assert len(names) == len(set(names)), "duplicate bench entries"
    line = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": 9999.9999,
            "unit": "sec",
            "queries": {n: 9999.9999 for n in names},
            "new_total": 9999.9999,
            "r4_total": 9999.9999,
            "r5_total": 9999.9999,
            "r6_total": 9999.9999,
            "r7_total": 9999.9999,
            "sf": 0.1,
            "parse_rows_per_sec": 9_999_999,
            "parse_rows_per_sec_4m": 9_999_999,
            "isolated_jvms": True,
            "min_totals": {
                s: 9999.9999
                for s in ("core", "new", "r4", "r5", "r6", "r7")
            },
        },
        separators=(",", ":"),
    )
    assert len(line) < 1900, f"bench JSON line budget blown: {len(line)}"

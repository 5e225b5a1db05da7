"""Round-12 composition-seam keys (SURVEY.md §2.12 r12 amendments).

The oracle preflight proves value parity; these tests pin the protocol
invariants the hash can't see. Most keys carry their asserts IN-KEY
(they raise before returning), so the tests drive the keys end-to-end
at sf0.001 and then re-check the observable artifacts the asserts
leave behind.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import functions as F

import sparkgraft
from conftest import SF_DIR


def test_cdf_schema_evolution_end_to_end(spark):
    """Driving the key exercises every in-key assert: the v1-head log
    plans WITHOUT channel / the v2-head log plans WITH it, the
    metadata-only add-column commit streams zero events, pre-evolution
    events carry NULL channel, and the signed per-channel replay equals
    the head merged-schema read."""
    out = sparkgraft.QUERIES["stream_cdf_schema_evolution"](spark, SF_DIR)
    rows = {
        (r.version, r.change_type, r.channel): (r.n_rows, r.cents)
        for r in out.collect()
    }
    # v2 (the add-column commit) must be absent from the feed entirely
    assert not any(v == 2 for v, _, _ in rows)
    # v1 inserts are ALL legacy (pre-evolution NULL projection)
    v1 = [ch for v, _, ch in rows if v == 1]
    assert v1 == ["LEGACY"]
    # v3 inserts carry all three channel values, never LEGACY
    v3 = sorted(ch for v, _, ch in rows if v == 3)
    assert v3 == ["b2b", "store", "web"]
    # v4 deletes cross BOTH generations: LEGACY and channel rows
    v4 = sorted(ch for v, _, ch in rows if v == 4)
    assert "LEGACY" in v4 and len(v4) == 4


def test_cdf_schema_evolution_planning_is_head_schema(spark):
    """The plan-time half directly: `_head_event_schema` resolves the
    event schema from the head manifest's schema_version stamp."""
    from sparkgraft.streaming import _head_event_schema

    sparkgraft.QUERIES["stream_cdf_schema_evolution"](spark, SF_DIR)
    root = os.path.join(
        tempfile.gettempdir(),
        f"sg-cdfevo-{os.path.basename(SF_DIR.rstrip('/'))}"
        f"-pid{os.getpid()}",
    )
    log_dir = os.path.join(root, "log")
    schema, sv = _head_event_schema(log_dir)
    assert sv == 2
    assert schema.fieldNames() == [
        "version", "change_type", "o_orderkey", "cents", "channel",
    ]
    # every commit carries the schema stamp forward (the discipline the
    # planner depends on)
    for f in sorted(os.listdir(log_dir)):
        if f.startswith("v") and f.endswith(".json"):
            with open(os.path.join(log_dir, f)) as fh:
                assert "schema_version" in json.load(fh), f

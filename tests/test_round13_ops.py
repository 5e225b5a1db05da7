"""Round-13 keys and fixes (SURVEY.md §2.12 r13 amendments).

Covers the r12 verdict's asks: the checkpoint-lost resume fix on the
stateful CDF readers (ADVICE #1), the re-lit general V>63 PPJoin
kernel (verdict "What's wrong" #1), and the new composition-seam keys
(checkpointed-root cross-table feed, OCC-rebase exactly-once,
AS-OF index consistency, schema evolution through the index feed,
vacuum x CDF contract).
"""

from __future__ import annotations

import json
import os

import sparkgraft
from conftest import SF_DIR


def _write_cursor(state_dir: str, version: int) -> None:
    os.makedirs(state_dir, exist_ok=True)
    with open(os.path.join(state_dir, "last_committed.json"), "w") as fh:
        json.dump({"version": version}, fh)


def test_log_cdf_reader_initial_offset_resumes_from_state_dir(tmp_path):
    """ADVICE r12 #1: a reader constructed with a state_dir cursor must
    RESUME from it in initialOffset() — the path Spark consults when
    the stream checkpoint is lost — not re-announce version 0 (which
    would replay 1.._last in one oversized batch, breaking the
    one-commit-per-batch contract and the feed_batch-stamp dedup)."""
    from sparkgraft.streaming import _log_cdf_reader_base

    base_cls = _log_cdf_reader_base()

    class _Concrete(base_cls):  # read() is abstract on the base
        def read(self, partition):  # pragma: no cover - never driven
            return iter([])

    base = _Concrete
    log_dir = str(tmp_path / "log")
    os.makedirs(log_dir)

    # no cursor -> fresh start at 0 (unchanged contract)
    r = base({"log_dir": log_dir})
    assert r.initialOffset() == {"version": 0}

    # persisted cursor -> initialOffset resumes there
    state = str(tmp_path / "state")
    _write_cursor(state, 7)
    r2 = base({"log_dir": log_dir, "state_dir": state})
    assert r2.initialOffset() == {"version": 7}


def test_txn_cdf_reader_initial_offset_resumes_from_state_dir(tmp_path):
    """Same checkpoint-lost resume contract on the txn-root reader."""
    from sparkgraft.streaming import _txn_cdf_datasource

    src_cls = _txn_cdf_datasource()
    log_dir = str(tmp_path / "log")
    os.makedirs(log_dir)
    state = str(tmp_path / "state")
    _write_cursor(state, 3)
    reader = src_cls(
        {"log_dir": log_dir, "state_dir": state}
    ).streamReader(None)
    assert reader.initialOffset() == {"version": 3}
    fresh = src_cls({"log_dir": log_dir}).streamReader(None)
    assert fresh.initialOffset() == {"version": 0}

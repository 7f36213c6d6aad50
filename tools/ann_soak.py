#!/usr/bin/env python
"""Continuous-ANN-index soak: 50 append micro-batches with the sink's
inline `compact_every=10` cadence, two crash/replay windows, one
simulated crash INSIDE the compaction swap, asserted against an
uncompacted twin and a one-shot build of the union corpus.

The unit tests (tests/test_streaming.py) pin single-compaction
invariants; this probe pins the REPEATED-fold path at horizon — the
ANN twin of `tools/compaction_soak.py` for the dedup index:

* after every compaction each `cell_id=` partition is at exactly the
  file target, and between compactions accretion never exceeds the
  cadence bound (vs the uncompacted twin's one-file-set-per-batch);
* a crash/replay of the latest committed batch (the only batch
  foreachBatch can redeliver) appends 0 vectors — including at a
  compaction boundary, where the re-run compaction is also a no-op;
* a crash inside the staged swap's delete+rename window (cell dir
  gone, staged replacement present) is healed by `recover_ann_index`
  with the row set byte-identical;
* at batch 50 the compacted index's (id, codes, cell_id) row set and
  its search results are IDENTICAL to both the uncompacted twin and a
  ONE-SHOT `ivfpq_build_index` over the union corpus (bootstrap holds
  the seed vectors, so frozen-quantizer appends converge exactly).

All checks are hard asserts; prints one JSON line on success.

Usage: python tools/ann_soak.py
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_etl_spark.operators.maintenance import partition_file_count  # noqa: E402
from flink_etl_spark.operators.merge import _hadoop_fs, stage_snapshot  # noqa: E402
from flink_etl_spark.operators.similarity import (  # noqa: E402
    ivfpq_append_index,
    ivfpq_build_index,
    ivfpq_search_index,
)
from flink_etl_spark.session import get_spark  # noqa: E402
from flink_etl_spark.streaming.ann_sink import (  # noqa: E402
    _ann_data_dirs,
    compact_ann_index,
    recover_ann_index,
)

N_BATCHES = 50
BATCH_ROWS = 40
BOOT_ROWS = 200
DIM = 16
COMPACT_EVERY = 10
TARGET_FILES = 1
#: replay the latest committed batch after these (20 = a compaction
#: boundary — the re-run executes the compaction call too; 37 =
#: mid-cadence)
REPLAY_AFTER = {20, 37}
#: simulate a crash INSIDE the compaction swap after this batch
CRASH_SWAP_AFTER = 25


def make_vec(rng: random.Random) -> list[float]:
    return [round(rng.uniform(-1, 1), 4) for _ in range(DIM)]


def main() -> None:
    spark = get_spark(app_name="ann-soak")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="ann_soak_")
    idx, idx2 = f"{root}/idx", f"{root}/idx2"
    rng = random.Random(7)
    schema = "vec_id long, embedding array<float>"

    boot_rows = [(i, make_vec(rng)) for i in range(BOOT_ROWS)]
    batches = [
        [
            (BOOT_ROWS + b * BATCH_ROWS + i, make_vec(rng))
            for i in range(BATCH_ROWS)
        ]
        for b in range(N_BATCHES)
    ]

    boot = spark.createDataFrame(boot_rows, schema)
    ivfpq_build_index(boot, idx, n_cells=4, m=8, n_codes=16)
    ivfpq_build_index(boot, idx2, n_cells=4, m=8, n_codes=16)

    def cells(p):
        return sorted(
            (r[0], bytes(r[1]), r[2])
            for r in spark.read.parquet(f"{p}/cells").collect()
        )

    def max_files(p):
        return max(partition_file_count(spark, d) for d in _ann_data_dirs(spark, p))

    t0 = time.perf_counter()
    n_replays = n_folds = 0
    max_between = 0
    for bid, rows in enumerate(batches):
        df = spark.createDataFrame(rows, schema)
        n = ivfpq_append_index(spark, df, idx)
        assert n == BATCH_ROWS, f"batch {bid}: appended {n} != {BATCH_ROWS}"
        if COMPACT_EVERY and bid > 0 and bid % COMPACT_EVERY == 0:
            folded = compact_ann_index(spark, idx, target_files=TARGET_FILES)
            assert folded >= 1, f"batch {bid}: expected a real fold"
            n_folds += 1
            assert max_files(idx) == TARGET_FILES, (
                f"batch {bid}: post-compaction files {max_files(idx)}"
            )
        if bid in REPLAY_AFTER:
            before = cells(idx)
            n = ivfpq_append_index(spark, df, idx)  # redelivered batch
            assert n == 0, f"replay of batch {bid} appended {n}"
            if COMPACT_EVERY and bid > 0 and bid % COMPACT_EVERY == 0:
                refold = compact_ann_index(spark, idx, target_files=TARGET_FILES)
                assert refold == 0, f"replayed compaction folded {refold}"
            assert cells(idx) == before, f"replay of batch {bid} changed rows"
            n_replays += 1
        if bid == CRASH_SWAP_AFTER:
            # crash inside the delete+rename window of one cell dir
            before = cells(idx)
            victim = _ann_data_dirs(spark, idx)[0]
            vdf = spark.read.parquet(victim)
            stage_snapshot(vdf.repartition(1), victim)
            fs, hp = _hadoop_fs(spark, victim)
            fs.delete(hp, True)
            assert recover_ann_index(spark, idx) == 1, "recovery missed"
            assert cells(idx) == before, "crash-window recovery changed rows"
        max_between = max(max_between, max_files(idx))

    # between compactions at most cadence-many batch file sets accrete
    # on top of the compacted file (appends may split a batch's cell
    # rows across a couple of files — allow 2x slack, still far under
    # the twin's unbounded accretion)
    bound = TARGET_FILES + 2 * COMPACT_EVERY
    assert max_between <= bound, f"{max_between} > bound {bound}"

    # uncompacted, replay-free twin
    for rows in batches:
        ivfpq_append_index(spark, spark.createDataFrame(rows, schema), idx2)
    twin_max = max_files(idx2)
    assert cells(idx) == cells(idx2), "compacted rows differ from twin"

    # one-shot build over the union corpus: identical searchable index
    all_rows = boot_rows + [r for b in batches for r in b]
    oneshot = f"{root}/oneshot"
    ivfpq_build_index(
        spark.createDataFrame(all_rows, schema), oneshot,
        n_cells=4, m=8, n_codes=16,
    )
    assert cells(idx) == cells(oneshot), "streamed index != one-shot build"

    qs = spark.createDataFrame(all_rows[:8], schema)
    search = lambda p: sorted(
        map(tuple, ivfpq_search_index(spark, p, qs, k=5, nprobe=2).collect())
    )
    assert search(idx) == search(oneshot) == search(idx2), "search drifted"

    print(json.dumps({
        "batches": N_BATCHES, "compact_every": COMPACT_EVERY,
        "folds": n_folds, "replays": n_replays, "crash_swaps": 1,
        "max_files_between_folds": max_between,
        "twin_max_files": twin_max,
        "rows_identical_twin_and_oneshot": True,
        "search_identical": True,
        "wall_sec": round(time.perf_counter() - t0, 1),
    }))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

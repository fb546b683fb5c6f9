"""Streaming ingest: exactly-once NT file ingest with dedup merge."""

import glob
import os

from pyspark.sql import functions as F

from triplestore_spark.dsl import subj_pred, triples_to_df
from triplestore_spark.sources.ntriples import encode_triples
from triplestore_spark.streaming.ingest import (
    _BUCKET,
    bucket_expr,
    compact_sink,
    fs_exists,
    merge_batch_into_sink,
    read_sink,
    stream_into_source,
)


def _batch(spark, ids):
    return triples_to_df(
        spark, [subj_pred(f"s{i}", "p").integer_literal(i) for i in ids]
    )


def test_merge_batch_idempotent_and_bucketed(spark, tmp_path):
    path = str(tmp_path / "sink.parquet")
    merge_batch_into_sink(_batch(spark, range(50)), path, n_buckets=8)
    merge_batch_into_sink(_batch(spark, range(25, 75)), path, n_buckets=8)
    # replay: a re-delivered batch must collapse entirely
    merge_batch_into_sink(_batch(spark, range(25, 75)), path, n_buckets=8)

    out = spark.read.parquet(path)
    assert out.count() == 75
    assert out.select("tkey").distinct().count() == 75
    # sink is physically partitioned by the tkey hash bucket
    assert glob.glob(os.path.join(path, f"{_BUCKET}=*"))


def test_merge_scan_is_partition_pruned(spark, tmp_path):
    """The anti-join's 'existing' side must carry a partition filter
    on the bucket column — per-batch read volume then scales with the
    batch's bucket fan-out, NOT total sink size (round 1 re-read the
    whole sink every micro-batch)."""
    path = str(tmp_path / "sink.parquet")
    merge_batch_into_sink(_batch(spark, range(200)), path, n_buckets=16)

    batch = _batch(spark, [3]).withColumn(_BUCKET, bucket_expr(16))
    touched = [r[0] for r in batch.select(_BUCKET).distinct().collect()]
    assert len(touched) == 1

    pruned = spark.read.parquet(path).where(F.col(_BUCKET).isin(touched))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    after = plan.split("PartitionFilters")[1][:300]
    assert _BUCKET in after, plan
    # physical evidence: the sink has >1 bucket dir, the batch touches 1
    dirs = glob.glob(os.path.join(path, f"{_BUCKET}=*"))
    assert len(dirs) > 1


def test_compact_sink_reduces_fragments(spark, tmp_path):
    path_dir = tmp_path / "table"
    data_path = str(path_dir / "triples.parquet")
    for lo in range(0, 60, 20):  # 3 append batches -> >=3 fragments
        merge_batch_into_sink(_batch(spark, range(lo, lo + 20)), data_path)

    before = read_sink(spark, str(path_dir))
    before_keys = sorted(r["tkey"] for r in before.select("tkey").collect())

    def frag_count():
        return len(glob.glob(os.path.join(data_path, "*", "*.parquet")))

    frags_before = frag_count()
    compact_sink(spark, str(path_dir), files_per_bucket=1)
    assert frag_count() < frags_before

    after = read_sink(spark, str(path_dir))
    assert sorted(r["tkey"] for r in after.select("tkey").collect()) == before_keys
    assert not fs_exists(spark, data_path + "._compacting")
    assert not fs_exists(spark, data_path + "._old")


def test_stream_compacts_on_cadence(spark, tmp_path):
    """With compact_every=1 the second micro-batch (batch_id=1...)
    triggers compaction: contents unchanged, fragments bounded."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    table_dir = str(tmp_path / "table")
    cp_dir = str(tmp_path / "cp")

    (in_dir / "a.nt").write_text(
        encode_triples(_batch(spark, range(10)))
    )
    q = stream_into_source(spark, str(in_dir), table_dir, cp_dir,
                           compact_every=1)
    q.awaitTermination(120)
    (in_dir / "b.nt").write_text(
        encode_triples(_batch(spark, range(5, 15)))
    )
    q2 = stream_into_source(spark, str(in_dir), table_dir, cp_dir,
                            compact_every=1)
    q2.awaitTermination(120)

    out = read_sink(spark, table_dir)
    assert out.select("tkey").distinct().count() == 15
    data_path = os.path.join(table_dir, "triples.parquet")
    assert not fs_exists(spark, data_path + "._compacting")
    assert not fs_exists(spark, data_path + "._old")


def test_fs_exists_storage_agnostic(spark, tmp_path):
    assert not fs_exists(spark, str(tmp_path / "nope"))
    (tmp_path / "yes").mkdir()
    assert fs_exists(spark, str(tmp_path / "yes"))


def test_stream_ingest_dedup_and_resume(spark, tmp_path):
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    table_dir = str(tmp_path / "table")
    cp_dir = str(tmp_path / "cp")

    t1 = subj_pred("s1", "p").integer_literal(1)
    t2 = subj_pred("s2", "p").integer_literal(2)
    t3 = subj_pred("s3", "p").integer_literal(3)

    (in_dir / "a.nt").write_text(encode_triples(triples_to_df(spark, [t1, t2])))

    q = stream_into_source(spark, str(in_dir), table_dir, cp_dir)
    q.awaitTermination(120)

    out = spark.read.parquet(os.path.join(table_dir, "triples.parquet"))
    assert {r["tkey"] for r in out.select("tkey").collect()} == {
        t1.tkey(),
        t2.tkey(),
    }

    # second file arrives: overlap (t2) + new (t3); resume from the
    # same checkpoint -> only the new file is read, dedup-merge keeps
    # the table canonical
    (in_dir / "b.nt").write_text(encode_triples(triples_to_df(spark, [t2, t3])))
    q2 = stream_into_source(spark, str(in_dir), table_dir, cp_dir)
    q2.awaitTermination(120)

    out2 = spark.read.parquet(os.path.join(table_dir, "triples.parquet"))
    keys = [r["tkey"] for r in out2.select("tkey").collect()]
    assert sorted(keys) == sorted({t1.tkey(), t2.tkey(), t3.tkey()})


def test_recover_sink_restores_bucket_swapped_mid_compaction(spark, tmp_path):
    """Crash window of the per-bucket swap (ADVICE r2 medium): a bucket
    renamed to ._old but whose compacted twin never landed must be
    restored by recover_sink — and merge_batch_into_sink must self-heal
    before merging instead of stranding prior data."""
    import shutil

    from triplestore_spark.streaming.ingest import recover_sink

    path = str(tmp_path / "sink.parquet")
    merge_batch_into_sink(_batch(spark, range(50)), path, n_buckets=8)
    before = {r["tkey"] for r in spark.read.parquet(path).select("tkey").collect()}

    # simulate the crash: one live bucket moved to ._old, its compacted
    # replacement not yet renamed in (it sits in a stale ._compacting)
    buckets = sorted(glob.glob(os.path.join(path, f"{_BUCKET}=*")))
    victim = buckets[0]
    old_dir = path + "._old"
    os.makedirs(old_dir, exist_ok=True)
    shutil.move(victim, os.path.join(old_dir, os.path.basename(victim)))
    os.makedirs(path + "._compacting", exist_ok=True)

    assert recover_sink(spark, path)
    after = {r["tkey"] for r in spark.read.parquet(path).select("tkey").collect()}
    assert after == before
    assert not os.path.exists(path + "._old")
    assert not os.path.exists(path + "._compacting")
    # idempotent when clean
    assert not recover_sink(spark, path)


def test_merge_recovers_legacy_full_swap_crash(spark, tmp_path):
    """Legacy whole-directory swap crash: data path missing, everything
    in ._old. Round 2's merge would treat this as a FRESH sink and
    silently strand all prior data; now it restores first."""
    import shutil

    path = str(tmp_path / "sink.parquet")
    merge_batch_into_sink(_batch(spark, range(20)), path, n_buckets=8)
    shutil.move(path, path + "._old")
    assert not os.path.exists(path)

    merge_batch_into_sink(_batch(spark, range(15, 30)), path, n_buckets=8)
    out = spark.read.parquet(path)
    assert out.select("tkey").distinct().count() == 30
    assert out.count() == 30
    assert not os.path.exists(path + "._old")


def test_compact_derives_bucket_count_from_sink(spark, tmp_path):
    """compact_sink must size its shuffle from the sink's OWN partition
    directories, not DEFAULT_BUCKETS (ADVICE r2: n_buckets=8 sink was
    compacted with a 64-bucket target)."""
    table_dir = str(tmp_path / "t")
    path = os.path.join(table_dir, "triples.parquet")
    for lo in (0, 30, 60):
        merge_batch_into_sink(_batch(spark, range(lo, lo + 40)), path, n_buckets=8)
    n_files_before = len(glob.glob(os.path.join(path, f"{_BUCKET}=*", "*.parquet")))
    compact_sink(spark, table_dir)
    out = spark.read.parquet(path)
    assert out.select("tkey").distinct().count() == 100
    assert out.count() == 100
    buckets = glob.glob(os.path.join(path, f"{_BUCKET}=*"))
    for b in buckets:
        assert len(glob.glob(os.path.join(b, "*.parquet"))) == 1, b
    assert len(glob.glob(os.path.join(path, f"{_BUCKET}=*", "*.parquet"))) < n_files_before


def test_merge_scan_is_partition_pruned_metrics(spark, tmp_path):
    """The bucket-pruned anti-join claim, metrics-asserted (VERDICT r2
    #8): the `existing` scan of a merge that touches one bucket must
    read only that bucket's files — numFiles from the executed scan
    node, not just the plan string."""
    path = str(tmp_path / "sink.parquet")
    merge_batch_into_sink(_batch(spark, range(200)), path, n_buckets=16)
    total_files = len(glob.glob(os.path.join(path, f"{_BUCKET}=*", "*.parquet")))

    # one-triple batch -> exactly one touched bucket
    batch = _batch(spark, [7]).withColumn(_BUCKET, bucket_expr(16))
    touched = [r[0] for r in batch.select(_BUCKET).distinct().collect()]
    assert len(touched) == 1
    scan = (
        spark.read.parquet(path)
        .where(F.col(_BUCKET).isin(touched))
        .select("tkey")
    )
    scan.collect()

    plan = scan._jdf.queryExecution().executedPlan()
    if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        plan = plan.executedPlan()
    leaves = plan.collectLeaves()
    num_files = None
    for i in range(leaves.size()):
        m = leaves.apply(i).metrics()
        if m.contains("numFiles"):
            num_files = m.apply("numFiles").value()
            break
    assert num_files is not None, "no file scan leaf with numFiles metric"
    bucket_files = len(
        glob.glob(os.path.join(path, f"{_BUCKET}={touched[0]}", "*.parquet"))
    )
    assert num_files == bucket_files
    assert num_files < total_files


def test_live_compaction_lock_defers_recovery(spark, tmp_path):
    """ADVICE r3: while a compactor holds the lock, recover_sink must
    NOT delete its ._compacting output or rename ._old buckets back —
    that's a live swap, not crash state. Once the lock goes stale (or
    is released), the same call self-heals as before."""
    import shutil

    from triplestore_spark.streaming.ingest import (
        _LOCK_SUFFIX,
        recover_sink,
    )

    path = str(tmp_path / "sink.parquet")
    merge_batch_into_sink(_batch(spark, range(50)), path, n_buckets=8)
    before = {r["tkey"] for r in spark.read.parquet(path).select("tkey").collect()}

    # mid-swap snapshot made by a LIVE compactor (lock held)
    buckets = sorted(glob.glob(os.path.join(path, f"{_BUCKET}=*")))
    victim = buckets[0]
    old_dir = path + "._old"
    os.makedirs(old_dir, exist_ok=True)
    shutil.move(victim, os.path.join(old_dir, os.path.basename(victim)))
    os.makedirs(path + "._compacting", exist_ok=True)
    lock = path + _LOCK_SUFFIX
    open(lock, "w").close()

    assert not recover_sink(spark, path)  # deferred, nothing touched
    assert os.path.exists(path + "._old")
    assert os.path.exists(path + "._compacting")
    assert os.path.exists(lock)

    # lease expiry: backdate the lock -> the compactor is presumed dead
    os.utime(lock, (0, 0))
    assert recover_sink(spark, path)
    after = {r["tkey"] for r in spark.read.parquet(path).select("tkey").collect()}
    assert after == before
    assert not os.path.exists(path + "._old")
    assert not os.path.exists(path + "._compacting")
    assert not os.path.exists(lock)


def test_second_compactor_refuses_live_lock(spark, tmp_path):
    """Two concurrent compactors on one sink is the corruption the lock
    exists to prevent — the late one must stop, and the sink must stay
    readable and compactable after the first lock expires."""
    import pytest as _pytest

    from triplestore_spark.streaming.ingest import _LOCK_SUFFIX

    table_dir = str(tmp_path / "t")
    path = os.path.join(table_dir, "triples.parquet")
    merge_batch_into_sink(_batch(spark, range(40)), path, n_buckets=8)

    lock = path + _LOCK_SUFFIX
    open(lock, "w").close()
    with _pytest.raises(RuntimeError, match="lock"):
        compact_sink(spark, table_dir)

    os.utime(lock, (0, 0))  # expired -> next compactor reclaims
    compact_sink(spark, table_dir)
    assert not os.path.exists(lock)
    assert spark.read.parquet(path).select("tkey").distinct().count() == 40


def test_open_split_path_uri_handling(tmp_path):
    """ADVICE r3: worker-side opens get Hadoop-FS paths verbatim —
    file:/, file:///, percent-encoding, s3a aliasing, and a clear
    refusal for Azure schemes and remote file authorities."""
    import pytest as _pytest

    from triplestore_spark.sources.binary import (
        BinaryDecodeError,
        _open_split_path,
    )

    p = tmp_path / "dir with space" / "x.bin"
    p.parent.mkdir()
    p.write_bytes(b"payload")
    # names with literal percent sequences must NOT be decoded —
    # Hadoop listings emit raw names
    q = tmp_path / "dir with space" / "a%20b.bin"
    q.write_bytes(b"percent")

    for uri in (
        str(p),
        "file:" + str(p),
        "file://" + str(p),  # empty authority
        "file://localhost" + str(p),
    ):
        with _open_split_path(uri) as f:
            assert f.read() == b"payload"
    with _open_split_path("file:" + str(q)) as f:
        assert f.read() == b"percent"

    with _pytest.raises(BinaryDecodeError, match="authority"):
        _open_split_path("file://otherhost/tmp/x.bin")
    for scheme in ("abfs", "abfss", "wasb", "wasbs"):
        with _pytest.raises(BinaryDecodeError, match=scheme):
            _open_split_path(f"{scheme}://container@acct/path/x.bin")
    # s3a must route through the pyarrow S3 driver (s3 scheme): the
    # nonexistent bucket fails with an S3/AWS error, NOT an unknown-
    # scheme error from from_uri
    try:
        _open_split_path("s3a://no-such-bucket-xyz/k.bin")
        raise AssertionError("expected S3 open to fail")
    except Exception as e:  # noqa: BLE001 - driver error type varies
        assert "s3a" not in str(e).lower()


def test_merge_refuses_live_compaction_lock(spark, tmp_path):
    """Review r4: appending while a compactor is mid-swap would let the
    swap silently drop the fresh fragments — merge must fail loudly
    under a live lock and succeed once it expires."""
    import pytest as _pytest

    from triplestore_spark.streaming.ingest import _LOCK_SUFFIX

    path = str(tmp_path / "sink.parquet")
    merge_batch_into_sink(_batch(spark, range(10)), path, n_buckets=4)
    lock = path + _LOCK_SUFFIX
    open(lock, "w").close()
    with _pytest.raises(RuntimeError, match="single-writer"):
        merge_batch_into_sink(_batch(spark, range(10, 20)), path, n_buckets=4)
    os.utime(lock, (0, 0))  # expired -> merge self-heals and proceeds
    merge_batch_into_sink(_batch(spark, range(10, 20)), path, n_buckets=4)
    assert spark.read.parquet(path).select("tkey").distinct().count() == 20
    assert not os.path.exists(lock)


def test_lock_lease_knob_end_to_end(spark, tmp_path):
    """VERDICT r4 #6: one configurable lease honored by BOTH sides. A
    30s-old lock is live under the default 1h lease (merge and compact
    refuse) but expired under a 10s lease (both proceed)."""
    import time

    import pytest as _pytest

    from triplestore_spark.streaming.ingest import _LOCK_SUFFIX

    table_dir = str(tmp_path / "t")
    path = os.path.join(table_dir, "triples.parquet")
    merge_batch_into_sink(_batch(spark, range(10)), path, n_buckets=4)

    lock = path + _LOCK_SUFFIX
    open(lock, "w").close()
    t = time.time() - 30
    os.utime(lock, (t, t))

    with _pytest.raises(RuntimeError, match="single-writer"):
        merge_batch_into_sink(_batch(spark, range(10, 20)), path, n_buckets=4)
    with _pytest.raises(RuntimeError, match="lock"):
        compact_sink(spark, table_dir)

    merge_batch_into_sink(
        _batch(spark, range(10, 20)), path, n_buckets=4, lock_lease_ms=10_000
    )
    open(lock, "w").close()
    os.utime(lock, (t, t))
    compact_sink(spark, table_dir, lock_lease_ms=10_000)
    assert not os.path.exists(lock)
    assert spark.read.parquet(path).select("tkey").distinct().count() == 20


class _FakeFS:
    """String-keyed in-memory FileSystem facade — just the five calls
    _claim_compaction_lock makes, with rename as the atomic primitive."""

    def __init__(self):
        import time

        self.files: dict[str, int] = {}
        self._now = lambda: int(time.time() * 1000)

    def _k(self, p) -> str:
        return str(p)

    def createNewFile(self, p) -> bool:
        k = self._k(p)
        if k in self.files:
            return False
        self.files[k] = self._now()
        return True

    def exists(self, p) -> bool:
        return self._k(p) in self.files

    def getFileStatus(self, p):
        mtime = self.files[self._k(p)]  # KeyError == FileNotFound

        class _St:
            def getModificationTime(self) -> int:
                return mtime

        return _St()

    def rename(self, a, b) -> bool:
        ka, kb = self._k(a), self._k(b)
        if ka not in self.files or kb in self.files:
            return False
        self.files[kb] = self.files.pop(ka)
        return True

    def delete(self, p, _rec=False) -> bool:
        return self.files.pop(self._k(p), None) is not None


def test_claim_lock_reclaims_expired_and_refuses_live(spark, tmp_path):
    from triplestore_spark.streaming.ingest import (
        _LOCK_SUFFIX,
        _claim_compaction_lock,
        _jpath,
    )
    import pytest as _pytest

    data_path = str(tmp_path / "sink.parquet")
    lock = _jpath(spark, data_path + _LOCK_SUFFIX)

    fs = _FakeFS()
    _claim_compaction_lock(fs, spark, data_path, lock, 1000)  # no lock yet
    assert fs.exists(lock)

    with _pytest.raises(RuntimeError, match="another compaction"):
        _claim_compaction_lock(fs, spark, data_path, lock, 60_000)

    fs.files[str(lock)] = 0  # expired leftover -> reclaimed atomically
    _claim_compaction_lock(fs, spark, data_path, lock, 1000)
    assert fs.exists(lock)
    assert len(fs.files) == 1  # no probe leftovers


def test_claim_lock_restores_stolen_fresh_lock(spark, tmp_path):
    """ADVICE r4 (medium): rival reclaims the expired lock and creates
    a FRESH one between our liveness stat and our rename. The old
    delete-then-create path would delete the rival's fresh lock (two
    live compactors). Now: our rename moves the fresh lock, the mtime
    re-check notices, the lock is renamed BACK, and we refuse."""
    import pytest as _pytest

    from triplestore_spark.streaming.ingest import (
        _LOCK_SUFFIX,
        _claim_compaction_lock,
        _jpath,
    )

    data_path = str(tmp_path / "sink.parquet")
    lock = _jpath(spark, data_path + _LOCK_SUFFIX)
    lock_key = str(lock)

    class _RacingFS(_FakeFS):
        def rename(self, a, b):
            # the rival's reclaim+re-create lands exactly before our
            # rename executes: the lock at `a` is suddenly FRESH
            if self._k(a) == lock_key and lock_key in self.files:
                self.files[lock_key] = self._now()
            return super().rename(a, b)

    fs = _RacingFS()
    fs.files[lock_key] = 0  # looks expired at the stat
    with _pytest.raises(RuntimeError, match="another compaction"):
        _claim_compaction_lock(fs, spark, data_path, lock, 60_000)
    # the rival's fresh lock is back in place, no probe leftovers
    assert list(fs.files) == [lock_key]
    assert fs.files[lock_key] > 0


def test_renew_lock_advances_mtime_even_without_settimes(spark, tmp_path):
    """ADVICE r4: fs.setTimes is an empty base-class method on some
    FileSystems — renewal must verify and fall back to rewriting the
    lock file."""
    from triplestore_spark.streaming.ingest import (
        _hadoop_fs,
        _lock_is_live,
        _renew_lock,
    )

    # real local FS: setTimes works, mtime verified to advance
    lockf = tmp_path / "x.lock"
    lockf.write_text("")
    os.utime(lockf, (0, 0))
    fs, jlock = _hadoop_fs(spark, str(lockf))
    assert not _lock_is_live(fs, jlock, 60_000)
    _renew_lock(fs, jlock)
    assert _lock_is_live(fs, jlock, 60_000)

    # no-op setTimes: fallback must REWRITE the file to bump mtime
    class _NoSetTimesFS(_FakeFS):
        def setTimes(self, p, mtime, atime):
            pass  # the Hadoop base-class no-op

        def create(self, p, overwrite=False):
            self.files[self._k(p)] = self._now()

            class _Out:
                def close(self):
                    pass

            return _Out()

    ffs = _NoSetTimesFS()
    ffs.files["lk"] = 0
    _renew_lock(ffs, "lk")
    assert ffs.files["lk"] > 0


def test_compact_skips_bucket_drifted_by_concurrent_merge(
    spark, tmp_path, monkeypatch
):
    """ADVICE r4 (low): a merge that passed its lock check before the
    compactor's claim can append between the compactor's snapshot and
    its swap. The swap must NOT replace such a bucket with the rewrite
    (which lacks the new fragments) — the bucket stays live and the
    appended rows survive."""
    from triplestore_spark.streaming import ingest as ing

    table_dir = str(tmp_path / "t")
    path = os.path.join(table_dir, "triples.parquet")
    for lo in (0, 20):
        merge_batch_into_sink(_batch(spark, range(lo, lo + 20)), path, n_buckets=4)
    base_keys = {
        r["tkey"] for r in spark.read.parquet(path).select("tkey").collect()
    }

    late = _batch(spark, range(100, 104)).withColumn(
        _BUCKET, bucket_expr(4)
    )
    late_keys = {r["tkey"] for r in late.select("tkey").collect()}
    drifted = sorted(
        f"{_BUCKET}={r[0]}" for r in late.select(_BUCKET).distinct().collect()
    )

    real_renew = ing._renew_lock
    fired = {}

    def sneaky_renew(fs, lock):
        real_renew(fs, lock)
        if not fired:
            fired["x"] = True
            # the in-flight merge's append commits here — after the
            # compactor's snapshot+rewrite, before its swap
            late.write.mode("append").partitionBy(_BUCKET).parquet(path)

    monkeypatch.setattr(ing, "_renew_lock", sneaky_renew)
    compact_sink(spark, table_dir)

    out = spark.read.parquet(path)
    got = {r["tkey"] for r in out.select("tkey").collect()}
    assert got == base_keys | late_keys  # nothing dropped
    assert fired
    # the drifted buckets kept >1 fragment (not compacted this round);
    # every untouched bucket was compacted to a single file
    for b in glob.glob(os.path.join(path, f"{_BUCKET}=*")):
        n = len(glob.glob(os.path.join(b, "*.parquet")))
        if os.path.basename(b) in drifted:
            assert n > 1, b
        else:
            assert n == 1, b
    # a later quiet compaction fully compacts
    compact_sink(spark, table_dir)
    for b in glob.glob(os.path.join(path, f"{_BUCKET}=*")):
        assert len(glob.glob(os.path.join(b, "*.parquet"))) == 1, b
    assert {
        r["tkey"]
        for r in spark.read.parquet(path).select("tkey").collect()
    } == base_keys | late_keys


def test_renew_lock_rewrites_when_mtime_does_not_advance(spark, tmp_path):
    """Review r5: the renewal check must compare against the PRE-CALL
    mtime — a fixed 'recent enough' window falsely accepts a no-op
    setTimes whenever the lock is younger than the window, leaving the
    lease unrenewed exactly when a short lease needs it."""
    import time

    from triplestore_spark.streaming.ingest import _renew_lock

    class _NoSetTimesFS(_FakeFS):
        def setTimes(self, p, mtime, atime):
            pass  # the Hadoop base-class no-op

        def create(self, p, overwrite=False):
            self.files[self._k(p)] = self._now()

            class _Out:
                def close(self):
                    pass

            return _Out()

    fs = _NoSetTimesFS()
    # a FRESH lock (5s old) on a no-op-setTimes store: the old 60s
    # tolerance would return without renewing
    before = int(time.time() * 1000) - 5_000
    fs.files["lk"] = before
    _renew_lock(fs, "lk")
    assert fs.files["lk"] > before


def test_lock_is_live_counts_inflight_reclaim_probe(spark, tmp_path):
    """Review r5: a reclaimer that moved a rival's FRESH lock aside
    must not leave the sink observably unlocked — a young
    `<lock>.reclaim.<uuid>` probe counts as the lock being held; an
    expired probe does not, and recover_sink clears it."""
    import time

    from triplestore_spark.streaming.ingest import (
        _LOCK_SUFFIX,
        _hadoop_fs,
        _lock_is_live,
        merge_batch_into_sink,
        recover_sink,
    )

    path = str(tmp_path / "sink.parquet")
    merge_batch_into_sink(_batch(spark, range(10)), path, n_buckets=4)
    lock = path + _LOCK_SUFFIX
    fs, jlock = _hadoop_fs(spark, lock)

    probe = lock + ".reclaim.deadbeef"
    open(probe, "w").close()
    assert _lock_is_live(fs, jlock, 60_000)  # no lock file, live probe
    # merges observe the probe as the lock being held
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="single-writer"):
        merge_batch_into_sink(_batch(spark, range(10, 20)), path, n_buckets=4)

    t = time.time() - 120
    os.utime(probe, (t, t))
    assert not _lock_is_live(fs, jlock, 60_000)  # expired probe
    # crash litter cleared once past the (same) lease recover honors
    assert recover_sink(spark, path, lock_lease_ms=60_000)
    assert not os.path.exists(probe)


def test_compact_recovers_fragment_appended_after_relist(
    spark, tmp_path, monkeypatch
):
    """Review r5: an append committing BETWEEN the per-bucket re-list
    and the rename rides into ._old with the bucket — the swap must
    move it back into the live bucket instead of deleting it with
    ._old (the silent exactly-once violation the re-list alone left
    open)."""
    import shutil

    from triplestore_spark.streaming import ingest as ing

    table_dir = str(tmp_path / "t")
    path = os.path.join(table_dir, "triples.parquet")
    for lo in (0, 20):
        merge_batch_into_sink(_batch(spark, range(lo, lo + 20)), path, n_buckets=4)
    base_keys = {
        r["tkey"] for r in spark.read.parquet(path).select("tkey").collect()
    }

    real_rename = ing._rename_or_raise
    state = {}

    def racing_rename(fs, src, dst):
        # the racer lands in the live bucket AFTER the re-list (which
        # already ran) and JUST BEFORE the live->._old rename executes
        if "._old/" in str(dst) + "/" and not state:
            frags = glob.glob(os.path.join(str(src), "*.parquet"))
            racer = os.path.join(str(src), "part-racer.parquet")
            shutil.copy(frags[0], racer)
            state["bucket"] = os.path.basename(str(src))
        return real_rename(fs, src, dst)

    monkeypatch.setattr(ing, "_rename_or_raise", racing_rename)
    compact_sink(spark, table_dir)

    assert state, "hook never fired"
    recovered = os.path.join(path, state["bucket"], "part-racer.parquet")
    assert os.path.exists(recovered), "racer fragment was destroyed"
    assert not os.path.exists(path + "._old")
    # the duplicate rows the racer carries collapse on tkey — the sink
    # stays canonical under read_sink-style dedup reads
    out = spark.read.parquet(path)
    assert {r["tkey"] for r in out.select("tkey").collect()} == base_keys

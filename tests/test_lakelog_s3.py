"""Commit-protocol core against a LIVE S3 API.

ConditionalPutCommitBackend proves the protocol needs only flat keys +
conditional PUT — but it models those semantics in-process. This module
closes the model-vs-store gap: the same protocol scenarios (exclusive
create, interleaved-writer refusal, append-retry, txn replay, CAS
checkpoint race) run through S3CommitBackend against a real moto S3
server over actual HTTP — real `If-None-Match: *` / `If-Match` handling,
real 412s, real ETags. Data files stay on the local data plane
(metadata plane and data plane are independent seams by design).

Skips cleanly when moto/boto3 are not installed.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

boto3 = pytest.importorskip("boto3")
pytest.importorskip("moto")

from aws_data_pipeline_ads_spark.catalog import load_table  # noqa: E402
from aws_data_pipeline_ads_spark.lakelog import (  # noqa: E402
    ConcurrentWriteError,
    LakeTable,
    S3CommitBackend,
)

BUCKET = "lakelog-protocol-test"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def s3_client():
    from moto.server import ThreadedMotoServer

    server = ThreadedMotoServer(port=0, verbose=False)
    server.start()
    try:
        client = boto3.client(
            "s3",
            endpoint_url=f"http://127.0.0.1:{server._server.port}",
            aws_access_key_id="testing",
            aws_secret_access_key="testing",
            region_name="us-east-1",
        )
        client.create_bucket(Bucket=BUCKET)
        yield client
    finally:
        server.stop()


@pytest.fixture
def mk_table(spark, s3_client):
    def make(path: str) -> LakeTable:
        return LakeTable(spark, path,
                         backend=S3CommitBackend(s3_client, BUCKET))

    return make


def test_commit_read_history_over_http(spark, sf_dir, tmp_path, mk_table):
    """Basic protocol cycle with every log object living in S3: commit,
    append, time travel, history — and the bucket actually holds the
    entry JSONs (not the local FS)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    t = mk_table(str(tmp_path / "tbl"))
    assert t.commit(docs.limit(8)) == 0
    assert t.commit(docs.limit(4), "append") == 1
    assert len(_rows(t.read(0))) == 8
    assert len(_rows(t.read())) == 12
    assert [h["op"] for h in t.history()] == ["overwrite", "append"]
    keys = s3_keys = t.backend.list(t.log_dir)
    assert "00000000.json" in keys and "00000001.json" in s3_keys
    # the JSON is byte-readable straight from the bucket
    entry = json.loads(t.backend.get(t._entry_path(1)))
    assert entry["op"] == "append"


def test_exclusive_create_is_server_side(s3_client, tmp_path):
    """put_if_absent loses with a REAL 412 from the server, not an
    in-process check: two writers, one key, exactly one winner."""
    b = S3CommitBackend(s3_client, BUCKET)
    key = str(tmp_path / "race.json")
    assert b.put_if_absent(key, "winner") is True
    assert b.put_if_absent(key, "loser") is False
    assert b.get(key) == "winner"


def test_interleaved_writer_refusal_over_http(spark, sf_dir, tmp_path,
                                              mk_table, monkeypatch):
    """The lost-update guard holds over HTTP: a writer whose transform
    raced a competitor gets ConcurrentWriteError from the server's 412,
    and the winner's commit is untouched."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    t = mk_table(str(tmp_path / "tbl"))
    other = mk_table(str(tmp_path / "tbl"))
    t.commit(docs.limit(5))
    orig = t._write_files

    def hijack(df, cmap=None):
        files = orig(df, cmap=cmap)
        if other.current_version() == 0:
            other.commit(docs.limit(2))
        return files

    monkeypatch.setattr(t, "_write_files", hijack)
    with pytest.raises(ConcurrentWriteError, match="version 1"):
        t.merge(docs.limit(3).withColumn("text", F.lit("x")), "doc_id")
    assert t.current_version() == 1
    assert len(_rows(t.read())) == 2


def test_append_retry_over_http(spark, sf_dir, tmp_path, mk_table,
                                monkeypatch):
    """Append-retry re-merges already-written files onto the new head
    through real conditional PUTs — both writers' rows land, data is
    written exactly once."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    t = mk_table(str(tmp_path / "tbl"))
    other = mk_table(str(tmp_path / "tbl"))
    t.commit(docs.filter(F.col("doc_id") % 3 == 0))
    writes = 0
    orig = t._write_files

    def hijack(df, cmap=None):
        nonlocal writes
        writes += 1
        files = orig(df, cmap=cmap)
        if other.current_version() == 0:
            other.commit(docs.filter(F.col("doc_id") % 3 == 1), "append")
        return files

    monkeypatch.setattr(t, "_write_files", hijack)
    v = t.commit(docs.filter(F.col("doc_id") % 3 == 2), "append", retries=2)
    assert v == 2 and writes == 1
    assert _rows(t.read()) == _rows(docs)


def test_txn_replay_over_http(spark, sf_dir, tmp_path, mk_table):
    """Exactly-once txn replay reads its answer back from the bucket."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    t = mk_table(str(tmp_path / "tbl"))
    assert t.commit(docs.limit(10), txn_id="job-1") == 0
    assert t.commit(docs.limit(99), txn_id="job-1") == 0  # replay
    assert t.current_version() == 0
    assert len(_rows(t.read())) == 10


def test_checkpoint_cas_over_http(spark, sf_dir, tmp_path, mk_table):
    """Checkpoint publication CAS runs on REAL If-Match/ETag semantics:
    consolidation works, per-version JSONs expire from the bucket, and
    a stale competitor's conditional PUT is refused by the server."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    t = mk_table(str(tmp_path / "tbl"))
    t.commit(docs.limit(4))
    t.commit(docs.limit(2), "append")
    t.commit(docs.limit(6))                    # head = v2
    rows_v2 = _rows(t.read(2))
    assert t.checkpoint(expire=True) == 2
    assert t.backend.list(t.log_dir) == ["_checkpoint.json"]
    published = t.backend.get(t._checkpoint_path())

    # stale competitor: expected=None (built pre-winner) → real 412
    competitor = {"through": 1, "entries": {}}
    assert t.backend.put_if_match(
        t._checkpoint_path(), json.dumps(competitor), None) is False
    # stale content CAS also refused (wrong ETag)
    assert t.backend.put_if_match(
        t._checkpoint_path(), json.dumps(competitor), "not-the-content"
    ) is False
    assert t.backend.get(t._checkpoint_path()) == published

    # a fresh reader answers entirely from the bucket's checkpoint
    t2 = mk_table(str(tmp_path / "tbl"))
    assert t2.current_version() == 2
    assert _rows(t2.read(2)) == rows_v2
    # and a post-checkpoint commit keeps numbering from the checkpoint
    assert t2.commit(docs.limit(1), "append") == 3


def test_put_if_match_cas_on_non_md5_etag_store(tmp_path):
    """ADVICE r8: on stores whose ETag is NOT content-MD5 (SSE-KMS,
    multipart, some S3-compatibles), synthesizing If-Match from
    md5(expected) makes every CAS lose forever — misreported as
    checkpoint contention. The backend must CAS on the ETag the store
    actually reports. Proven against a fake S3 client with opaque
    ETags that enforces real If-Match/If-None-Match semantics."""
    from botocore.exceptions import ClientError

    from aws_data_pipeline_ads_spark.lakelog import S3CommitBackend

    class OpaqueEtagS3:
        """Dict-backed S3 with server-side conditional writes whose
        ETags are opaque tokens, never content-MD5."""

        def __init__(self):
            self.objects: dict[str, tuple[bytes, str]] = {}
            self.n = 0

        def _err(self, code, op):
            return ClientError({"Error": {"Code": code}}, op)

        def put_object(self, Bucket, Key, Body, IfNoneMatch=None,
                       IfMatch=None):
            cur = self.objects.get(Key)
            if IfNoneMatch == "*" and cur is not None:
                raise self._err("PreconditionFailed", "PutObject")
            if IfMatch is not None and (cur is None or cur[1] != IfMatch):
                raise self._err("PreconditionFailed", "PutObject")
            self.n += 1
            self.objects[Key] = (Body, f'"opaque-{self.n}"')

        def head_object(self, Bucket, Key):
            if Key not in self.objects:
                raise self._err("404", "HeadObject")
            return {"ETag": self.objects[Key][1]}

        def get_object(self, Bucket, Key):
            if Key not in self.objects:
                raise self._err("NoSuchKey", "GetObject")
            import io

            return {"Body": io.BytesIO(self.objects[Key][0])}

    be = S3CommitBackend(OpaqueEtagS3(), "kms-bucket")
    path = "/tbl/_log/_checkpoint.json"
    assert be.put_if_absent(path, "v1") is True
    # the CAS that md5-synthesis would lose forever: expected matches
    # the CURRENT CONTENT, but the store's ETag is not its MD5
    assert be.put_if_match(path, "v2", "v1") is True
    assert be.get(path) == "v2"
    # stale expected content still refuses (genuine lost race)
    assert be.put_if_match(path, "v3", "v1") is False
    assert be.get(path) == "v2"
    # expected=None routes to exclusive-create, which must lose here
    assert be.put_if_match(path, "v3", None) is False
    # CAS against a vanished object reports a loss, not a crash
    assert be.put_if_match("/tbl/_log/_gone.json", "x", "y") is False

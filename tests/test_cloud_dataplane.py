"""S3DataPlane / AzureBlobDataPlane (sources/object_store.py): the
data-plane protocol driven against dict-backed SDK stubs — key mapping,
prefix listings, per-object publish copy+delete, atomic text puts,
FileNotFoundError mapping, and a REAL parquet footer read through the
seekable ranged-GET reader (no full-object download). Real-bucket runs
gate on SPARK_GRAFT_S3_TEST_BUCKET like the pointer-plane suite."""

from __future__ import annotations

import datetime as _dt
import io
import os

import pytest

from vector_search_ai_assistant_mongodbvcore_spark.sources.object_store import (
    AzureBlobDataPlane,
    S3DataPlane,
    _RangedReader,
    dataplane_from_url,
)


# ---------------------------------------------------------------------------
# stub S3 client: the subset of botocore surface the plane touches


class _Err(Exception):
    def __init__(self, code, status):
        super().__init__(code)
        self.response = {
            "Error": {"Code": code},
            "ResponseMetadata": {"HTTPStatusCode": status},
        }


class _StubS3:
    def __init__(self):
        self.objects: dict[tuple[str, str], bytes] = {}
        self.get_calls: list[str] = []

    def put_object(self, Bucket, Key, Body):
        self.objects[(Bucket, Key)] = Body if isinstance(Body, bytes) else Body.encode()
        return {}

    def get_object(self, Bucket, Key, Range=None):
        if (Bucket, Key) not in self.objects:
            raise _Err("NoSuchKey", 404)
        data = self.objects[(Bucket, Key)]
        if Range is not None:
            self.get_calls.append(Range)
            lo, hi = Range.removeprefix("bytes=").split("-")
            data = data[int(lo) : int(hi) + 1]
        return {"Body": io.BytesIO(data)}

    def head_object(self, Bucket, Key):
        if (Bucket, Key) not in self.objects:
            raise _Err("NotFound", 404)
        return {"ContentLength": len(self.objects[(Bucket, Key)])}

    def copy_object(self, Bucket, Key, CopySource):
        src = (CopySource["Bucket"], CopySource["Key"])
        if src not in self.objects:
            raise _Err("NoSuchKey", 404)
        self.objects[(Bucket, Key)] = self.objects[src]
        return {}

    def delete_object(self, Bucket, Key):
        self.objects.pop((Bucket, Key), None)
        return {}

    def delete_objects(self, Bucket, Delete):
        for o in Delete["Objects"]:
            self.objects.pop((Bucket, o["Key"]), None)
        return {}

    def list_objects_v2(self, Bucket, Prefix, Delimiter=None, MaxKeys=None,
                        ContinuationToken=None):
        keys = sorted(k for (b, k) in self.objects if b == Bucket and k.startswith(Prefix))
        if Delimiter:
            contents, prefixes = [], []
            seen = set()
            for k in keys:
                rest = k[len(Prefix):]
                if Delimiter in rest:
                    p = Prefix + rest.split(Delimiter, 1)[0] + Delimiter
                    if p not in seen:
                        seen.add(p)
                        prefixes.append({"Prefix": p})
                else:
                    contents.append(k)
            out = {
                "Contents": [self._entry(Bucket, k) for k in contents],
                "CommonPrefixes": prefixes,
            }
        else:
            if MaxKeys:
                keys = keys[:MaxKeys]
            out = {"Contents": [self._entry(Bucket, k) for k in keys]}
        return out

    def _entry(self, b, k):
        return {
            "Key": k,
            "LastModified": _dt.datetime.now(_dt.timezone.utc),
        }


@pytest.fixture()
def s3():
    return _StubS3()


@pytest.fixture()
def plane(s3):
    return S3DataPlane(client=s3)


def test_s3_text_roundtrip_and_missing(plane):
    plane.write_text("s3a://bkt/t/filestats_0.json", '{"a": 1}')
    assert plane.read_text("s3a://bkt/t/filestats_0.json") == '{"a": 1}'
    with pytest.raises(FileNotFoundError):
        plane.read_text("s3a://bkt/t/absent.json")
    with pytest.raises(ValueError):
        plane.read_text("/local/path")  # foreign scheme never maps silently


def test_s3_exists_object_and_prefix(plane):
    assert not plane.exists("s3a://bkt/t/v_0")
    plane.write_text("s3a://bkt/t/v_0/part-0.parquet", "x")
    assert plane.exists("s3a://bkt/t/v_0")  # prefix with objects under it
    assert plane.exists("s3a://bkt/t/v_0/part-0.parquet")  # exact object


def test_s3_publish_copies_then_deletes_source(plane, s3):
    for name in ("part-0.parquet", "_bucket=3/part-1.parquet"):
        plane.write_text(f"s3a://bkt/t/_staging_ab/{name}", name)
    plane.publish("s3a://bkt/t/_staging_ab", "s3a://bkt/t/v_1_uff")
    assert plane.read_text("s3a://bkt/t/v_1_uff/part-0.parquet") == "part-0.parquet"
    assert plane.read_text("s3a://bkt/t/v_1_uff/_bucket=3/part-1.parquet") == "_bucket=3/part-1.parquet"
    assert not plane.exists("s3a://bkt/t/_staging_ab")
    with pytest.raises(FileNotFoundError):
        plane.publish("s3a://bkt/t/_staging_gone", "s3a://bkt/t/v_2_u00")


def test_s3_listings(plane):
    plane.write_text("s3a://bkt/t/_VERSION", "{}")
    plane.write_text("s3a://bkt/t/v_0/a.parquet", "x")
    plane.write_text("s3a://bkt/t/v_0/b.parquet", "x")
    plane.write_text("s3a://bkt/t/v_0/_SUCCESS", "")
    plane.write_text("s3a://bkt/t/v_1/_bucket=0/c.parquet", "x")
    plane.write_text("s3a://bkt/t/v_1/_bucket=1/d.parquet", "x")
    assert plane.list_names("s3a://bkt/t") == ["_VERSION", "v_0", "v_1"]
    assert plane.list_parquet("s3a://bkt/t/v_0") == [
        "s3a://bkt/t/v_0/a.parquet", "s3a://bkt/t/v_0/b.parquet",
    ]
    # one-level-deep only, in both directions
    assert plane.list_parquet("s3a://bkt/t/v_1") == []
    assert plane.list_parquet_partitions("s3a://bkt/t/v_1") == [
        "s3a://bkt/t/v_1/_bucket=0/c.parquet", "s3a://bkt/t/v_1/_bucket=1/d.parquet",
    ]
    assert plane.list_names("s3a://bkt/absent") == []  # [] not raise


def test_s3_remove_tree_and_file(plane):
    plane.write_text("s3a://bkt/t/v_0/a.parquet", "x")
    plane.write_text("s3a://bkt/t/v_0/_bucket=1/b.parquet", "x")
    plane.remove_tree("s3a://bkt/t/v_0")
    assert not plane.exists("s3a://bkt/t/v_0")
    plane.write_text("s3a://bkt/t/f.json", "x")
    plane.remove_file("s3a://bkt/t/f.json")
    assert not plane.exists("s3a://bkt/t/f.json")


def test_s3_newest_mtime_tracks_objects(plane):
    assert plane.newest_mtime("s3a://bkt/t/_staging_x") == 0.0
    plane.write_text("s3a://bkt/t/_staging_x/part", "x")
    import time

    assert abs(plane.newest_mtime("s3a://bkt/t/_staging_x") - time.time()) < 5


def test_ranged_reader_reads_real_parquet_footer(plane, s3, tmp_path):
    """pyarrow reads metadata + a column through ranged GETs only —
    never a bytes=0-<end> whole-object fetch."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 200_000
    local = tmp_path / "x.parquet"
    pq.write_table(
        pa.table({"id": list(range(n)), "v": [f"string-value-{i:07d}" for i in range(n)]}),
        local,
        compression="none",
    )
    raw = local.read_bytes()
    assert len(raw) > 4_000_000  # big enough that a slurp would be obvious
    s3.objects[("bkt", "t/v_0/x.parquet")] = raw
    f = plane.open_parquet_input("s3a://bkt/t/v_0/x.parquet")
    pf = pq.ParquetFile(f)
    assert pf.metadata.num_rows == n
    st = pf.metadata.row_group(0).column(0).statistics
    assert st.min == 0
    fetched = sum(
        int(r.removeprefix("bytes=").split("-")[1])
        - int(r.removeprefix("bytes=").split("-")[0]) + 1
        for r in s3.get_calls
    )
    assert s3.get_calls and fetched < len(raw) // 4, (fetched, len(raw))


def test_ranged_reader_seek_contract():
    data = bytes(range(256))
    r = _RangedReader(lambda s, n: data[s : s + n], len(data))
    assert r.size() == 256
    r.seek(-4, 2)
    assert r.read() == data[-4:]
    r.seek(10)
    assert r.read(4) == data[10:14]
    assert r.tell() == 14
    assert r.read(0) == b""


# ---------------------------------------------------------------------------
# Azure twin (stub container client)


class _AzErr(Exception):
    def __init__(self, code, status):
        super().__init__(code)
        self.error_code = code
        self.status_code = status


class _StubReader:
    def __init__(self, data):
        self._d = data

    def readall(self):
        return self._d


class _StubBlob:
    def __init__(self, store, name):
        self._s, self.name = store, name
        self.url = f"stub://{name}"

    def download_blob(self, offset=None, length=None):
        if self.name not in self._s:
            raise _AzErr("BlobNotFound", 404)
        d = self._s[self.name]
        if offset is not None:
            d = d[offset : offset + length]
        return _StubReader(d)

    def upload_blob(self, data, overwrite=False):
        if not overwrite and self.name in self._s:
            raise _AzErr("BlobAlreadyExists", 409)
        self._s[self.name] = data if isinstance(data, bytes) else data.encode()
        return {"etag": '"e1"'}

    def delete_blob(self):
        if self.name not in self._s:
            raise _AzErr("BlobNotFound", 404)
        del self._s[self.name]

    def get_blob_properties(self):
        if self.name not in self._s:
            raise _AzErr("BlobNotFound", 404)

        class _P:
            size = len(self._s[self.name])
            last_modified = _dt.datetime.now(_dt.timezone.utc)

        return _P()

    def start_copy_from_url(self, url):
        src = url.removeprefix("stub://")
        if src not in self._s:
            raise _AzErr("BlobNotFound", 404)
        self._s[self.name] = self._s[src]
        return {"copy_status": "success"}


class _StubContainer:
    def __init__(self):
        self.store: dict[str, bytes] = {}

    def get_blob_client(self, name):
        return _StubBlob(self.store, name)

    def list_blobs(self, name_starts_with=""):
        class _B:
            def __init__(self, n, sz):
                self.name = n
                self.last_modified = _dt.datetime.now(_dt.timezone.utc)

        return [
            _B(n, len(d))
            for n, d in sorted(self.store.items())
            if n.startswith(name_starts_with)
        ]


@pytest.fixture()
def az():
    return AzureBlobDataPlane("cont", container_client=_StubContainer())


def test_azure_full_protocol(az):
    az.write_text("abfs://cont/t/_staging_x/a.parquet", "A")
    az.write_text("abfs://cont/t/_staging_x/_bucket=0/b.parquet", "B")
    az.publish("abfs://cont/t/_staging_x", "abfs://cont/t/v_0_u1")
    assert az.read_text("abfs://cont/t/v_0_u1/a.parquet") == "A"
    assert not az.exists("abfs://cont/t/_staging_x")
    assert az.list_names("abfs://cont/t") == ["v_0_u1"]
    assert az.list_parquet("abfs://cont/t/v_0_u1") == ["abfs://cont/t/v_0_u1/a.parquet"]
    assert az.list_parquet_partitions("abfs://cont/t/v_0_u1") == [
        "abfs://cont/t/v_0_u1/_bucket=0/b.parquet"
    ]
    assert az.newest_mtime("abfs://cont/t") > 0
    with pytest.raises(FileNotFoundError):
        az.read_text("abfs://cont/t/absent")
    with pytest.raises(FileNotFoundError):
        az.remove_file("abfs://cont/t/absent")
    with pytest.raises(ValueError):
        az.read_text("abfs://other/t/x")  # foreign container rejected
    az.remove_tree("abfs://cont/t/v_0_u1")
    assert not az.exists("abfs://cont/t/v_0_u1")


def test_azure_ranged_parquet_footer(az, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    local = tmp_path / "x.parquet"
    pq.write_table(pa.table({"id": [1, 2, 3]}), local)
    az.write_text("abfs://cont/d/x.parquet", "placeholder")
    az._c.store["d/x.parquet"] = local.read_bytes()
    pf = pq.ParquetFile(az.open_parquet_input("abfs://cont/d/x.parquet"))
    assert pf.metadata.num_rows == 3


# ---------------------------------------------------------------------------
# deployment seam


def test_dataplane_from_url():
    from vector_search_ai_assistant_mongodbvcore_spark.sources.dataplane import (
        EmulatedObjectDataPlane,
        LocalDataPlane,
    )

    assert isinstance(dataplane_from_url("local://"), LocalDataPlane)
    assert isinstance(dataplane_from_url("object://"), EmulatedObjectDataPlane)
    for bad in ("gs://x", "s3://bucket", "abfs://", "nope"):
        with pytest.raises(ValueError):
            dataplane_from_url(bad)


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_S3_TEST_BUCKET"),
    reason="set SPARK_GRAFT_S3_TEST_BUCKET to run against real S3",
)
def test_s3_real_bucket_roundtrip():  # pragma: no cover - env-gated
    bucket = os.environ["SPARK_GRAFT_S3_TEST_BUCKET"]
    plane = S3DataPlane()
    base = f"s3a://{bucket}/spark-graft-dataplane-test"
    plane.write_text(f"{base}/_staging_t/a.txt", "hello")
    plane.publish(f"{base}/_staging_t", f"{base}/v_0_u1")
    assert plane.read_text(f"{base}/v_0_u1/a.txt") == "hello"
    plane.remove_tree(base)

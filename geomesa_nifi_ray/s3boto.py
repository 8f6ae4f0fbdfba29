"""boto3-backed ``pyarrow.fs`` handler: the S3 REST API as a LakeFS
backend without arrow's C++ S3 client.

Why it exists: the object-store commit mode (``lake.py`` no-rename
publish) needs an S3-API integration test (the reference integration-
tests MinIO/S3, ``PutGeoMesaFsTest.scala:60-103``), and the only S3
server available in this sandbox is moto — whose
``CompleteMultipartUpload`` response arrow's C++ client rejects
("error embedded in a 200 OK response"). botocore speaks the same REST
API and accepts it, so this handler adapts boto3 to
``pyarrow.fs.FileSystemHandler``:

* every ``open_output_stream`` buffers and publishes with ONE
  ``put_object`` on close — exactly the atomic single-PUT primitive the
  no-rename commit mode assumes (a torn writer publishes nothing);
* reads are ``get_object`` into a seekable ``BufferReader`` (parquet
  footers seek);
* ``move`` raises: S3 has no rename, which is the point — a LakeFS over
  this handler must run with ``rename_capable=False``;
* pickles into Ray tasks by carrying only endpoint + credentials; the
  botocore client is rebuilt lazily per process.

Paths are ``bucket/key...`` like arrow's own S3FileSystem.

Real-S3 assumptions of the no-rename commit protocol, made explicit:

* **PUT is atomic and the manifest PUT is the linearization point** — S3
  never exposes a partial object, and readers resolve state only through
  manifests, so a crash mid-epoch leaves unreferenced data objects, never
  a torn table.
* **Replayed PUTs are idempotent by construction**: every data path is
  deterministic in (bucket, epoch, kind) and its content is
  deterministic from the immutable source epoch, so retried tasks write
  identical bytes and last-writer-wins is harmless. The MANIFEST commit
  additionally carries a conditional-PUT fence (``If-None-Match: *``,
  GA on real S3 since 2024; :meth:`BotoS3Handler.put_if_absent`):
  a second writer racing the same epoch either wrote identical bytes
  (benign, commit_epoch returns) or diverged — split brain — and fails
  loudly instead of silently overwriting history.
* **Strong read-after-write consistency** (S3 guarantee since 2020):
  the resume path lists/HEADs manifests immediately after commit; an
  eventually-consistent store would need a commit marker re-check loop.
"""

from __future__ import annotations

import io

import pyarrow as pa
import pyarrow.fs as pafs


class _PutOnClose(io.BytesIO):
    """Buffer writes; one put_object at close = the atomic S3 publish."""

    def __init__(self, client, bucket: str, key: str):
        super().__init__()
        self._client, self._bucket, self._key = client, bucket, key
        self._published = False

    def close(self):
        if not self._published and not self.closed:
            self._client.put_object(Bucket=self._bucket, Key=self._key,
                                    Body=self.getvalue())
            self._published = True
        super().close()


class BotoS3Handler(pafs.FileSystemHandler):
    def __init__(self, endpoint_url: str, access_key: str = "testing",
                 secret_key: str = "testing", region: str = "us-east-1"):
        self.endpoint_url = endpoint_url
        self.access_key = access_key
        self.secret_key = secret_key
        self.region = region
        self._cl = None

    # -- pickling (Ray tasks): drop the live client --------------------------

    def __getstate__(self):
        return {k: v for k, v in self.__dict__.items() if k != "_cl"}

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._cl = None

    def _client(self):
        if self._cl is None:
            import boto3

            self._cl = boto3.client(
                "s3", endpoint_url=self.endpoint_url,
                region_name=self.region,
                aws_access_key_id=self.access_key,
                aws_secret_access_key=self.secret_key,
            )
        return self._cl

    # -- helpers --------------------------------------------------------------

    @staticmethod
    def _split(path: str) -> tuple[str, str]:
        path = path.strip("/")
        bucket, _, key = path.partition("/")
        return bucket, key

    def _info(self, path: str) -> pafs.FileInfo:
        from botocore.exceptions import ClientError

        bucket, key = self._split(path)
        cl = self._client()
        if key:
            try:
                h = cl.head_object(Bucket=bucket, Key=key)
                return pafs.FileInfo(path, pafs.FileType.File,
                                     size=h["ContentLength"])
            except ClientError:
                pass
            # a "directory" exists iff any key lives under the prefix
            r = cl.list_objects_v2(Bucket=bucket, Prefix=key.rstrip("/") + "/",
                                   MaxKeys=1)
            if r.get("KeyCount", 0):
                return pafs.FileInfo(path, pafs.FileType.Directory)
            return pafs.FileInfo(path, pafs.FileType.NotFound)
        try:
            cl.head_bucket(Bucket=bucket)
            return pafs.FileInfo(path, pafs.FileType.Directory)
        except ClientError:
            return pafs.FileInfo(path, pafs.FileType.NotFound)

    # -- FileSystemHandler protocol --------------------------------------------

    def get_type_name(self):
        return "boto-s3"

    def __eq__(self, other):
        return (isinstance(other, BotoS3Handler)
                and other.endpoint_url == self.endpoint_url)

    def __ne__(self, other):
        return not self.__eq__(other)

    def get_file_info(self, paths):
        return [self._info(p) for p in paths]

    def get_file_info_selector(self, selector):
        bucket, key = self._split(selector.base_dir)
        prefix = key.rstrip("/") + "/" if key else ""
        cl = self._client()
        out = []
        kw = {"Bucket": bucket, "Prefix": prefix}
        if not selector.recursive:
            kw["Delimiter"] = "/"
        token = None
        while True:
            if token:
                kw["ContinuationToken"] = token
            r = cl.list_objects_v2(**kw)
            for o in r.get("Contents", []):
                if o["Key"] == prefix:
                    continue  # directory marker object
                out.append(pafs.FileInfo(f"{bucket}/{o['Key']}",
                                         pafs.FileType.File, size=o["Size"]))
            for p in r.get("CommonPrefixes", []):
                out.append(pafs.FileInfo(
                    f"{bucket}/{p['Prefix'].rstrip('/')}",
                    pafs.FileType.Directory))
            token = r.get("NextContinuationToken")
            if not token:
                break
        if not out and key and not self._info(selector.base_dir).is_file:
            if (self._info(selector.base_dir).type == pafs.FileType.NotFound
                    and not selector.allow_not_found):
                raise FileNotFoundError(selector.base_dir)
        return out

    def create_dir(self, path, recursive):
        pass  # S3 directories are virtual

    def delete_dir(self, path):
        bucket, key = self._split(path)
        prefix = key.rstrip("/") + "/" if key else ""
        cl = self._client()
        # paginate: list_objects_v2 returns at most 1000 keys per call —
        # a single unpaginated pass would silently leave the rest behind
        # (a "deleted" table dir still holding data files). Batch deletes
        # 1000 at a time via delete_objects.
        token = None
        while True:
            kw = {"Bucket": bucket, "Prefix": prefix}
            if token:
                kw["ContinuationToken"] = token
            r = cl.list_objects_v2(**kw)
            keys = [{"Key": o["Key"]} for o in r.get("Contents", [])]
            if keys:
                resp = cl.delete_objects(
                    Bucket=bucket, Delete={"Objects": keys, "Quiet": True})
                errs = resp.get("Errors") or []
                if errs:
                    # batch deletes return 200 with per-key failures in
                    # Errors; swallowing them would report a "deleted" dir
                    # that still holds objects
                    raise OSError(
                        f"delete_dir {path}: {len(errs)} object(s) failed "
                        f"to delete; first: {errs[0]}")
            token = r.get("NextContinuationToken")
            if not token:
                break

    def delete_dir_contents(self, path, missing_dir_ok=False):
        self.delete_dir(path)

    def delete_root_dir_contents(self):
        raise NotImplementedError("refusing to clear the root")

    def delete_file(self, path):
        bucket, key = self._split(path)
        self._client().delete_object(Bucket=bucket, Key=key)

    def move(self, src, dest):
        raise NotImplementedError(
            "S3 has no rename; run LakeFS with rename_capable=False")

    def copy_file(self, src, dest):
        sb, sk = self._split(src)
        db, dk = self._split(dest)
        self._client().copy_object(Bucket=db, Key=dk,
                                   CopySource={"Bucket": sb, "Key": sk})

    # -- conditional publish (not part of FileSystemHandler) -------------------

    def put_if_absent(self, path: str, data: bytes) -> bool:
        """Atomic create-if-absent via S3 conditional PUT
        (``If-None-Match: *``, GA on real S3 since 2024; moto supports
        it). Returns False when the object already exists — the
        split-brain fence ``LakeFS.publish_json(if_absent=True)`` probes
        for this method."""
        import time

        from botocore.exceptions import ClientError

        bucket, key = self._split(path)
        for attempt in range(5):
            try:
                self._client().put_object(Bucket=bucket, Key=key, Body=data,
                                          IfNoneMatch="*")
                return True
            except ClientError as e:
                code = e.response.get("Error", {}).get("Code")
                if code in ("PreconditionFailed", "412"):
                    return False
                if code in ("ConditionalRequestConflict", "409",
                            "OperationAborted"):
                    # real S3 can answer a RACING conditional PUT with 409
                    # (retry-and-see semantics) instead of 412; moto always
                    # 412s. Re-probe: if the rival's PUT landed, that is
                    # the normal lost-the-race outcome; otherwise retry.
                    if self._info(path).type == pafs.FileType.File:
                        return False
                    time.sleep(0.05 * (attempt + 1))
                    continue
                raise
        # five conflicting rounds with no object appearing: surface it
        raise OSError(f"put_if_absent: persistent conditional-PUT conflict "
                      f"on {path}")

    def open_input_stream(self, path):
        return self.open_input_file(path)

    def open_input_file(self, path):
        from botocore.exceptions import ClientError

        bucket, key = self._split(path)
        try:
            body = self._client().get_object(Bucket=bucket,
                                             Key=key)["Body"].read()
        except ClientError as e:
            raise FileNotFoundError(path) from e
        return pa.BufferReader(body)

    def open_output_stream(self, path, metadata=None):
        bucket, key = self._split(path)
        return pa.PythonFile(_PutOnClose(self._client(), bucket, key),
                             mode="w")

    def open_append_stream(self, path, metadata=None):
        raise NotImplementedError("S3 objects are immutable")

    def normalize_path(self, path):
        return path.strip("/")


def boto_s3_lakefs(endpoint_url: str, **kw):
    """A :class:`~geomesa_nifi_ray.lake.LakeFS` over the boto3 S3 handler —
    always ``rename_capable=False`` (single-PUT publish)."""
    from geomesa_nifi_ray.lake import LakeFS

    return LakeFS(pafs.PyFileSystem(BotoS3Handler(endpoint_url, **kw)),
                  rename_capable=False)

"""Records sinks: push finished TFRecord shards to a destination.

The reference sketches (WIP, broken cells) uploading shards to
Descartes Labs Storage via signed URLs
(/root/reference/parse_tfrecords.ipynb cells 39-46). There is no DL
service here, so the honest equivalent is a pluggable sink interface
with two concrete backends:

* ``LocalDirSink`` -- copy (hardlink when possible) into a managed
  root and record a manifest; the "blob store on a shared filesystem"
  deployment.
* ``SignedURLSink`` -- HTTP PUT each shard to a caller-supplied
  presigned URL (the exact S3/GCS/DL-Storage upload shape), stdlib
  urllib only.

``push_shards`` drives either from a glob, shard-level resumable via
the manifest.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import threading
from typing import Dict, List


class RecordsSink:
    """Destination for finished shards. Implementations must be safe
    to call from multiple threads (one shard per call)."""

    def put_shard(self, path: str) -> str:
        """Upload/store one shard file; returns its remote identifier."""
        raise NotImplementedError

    def exists(self, shard_name: str) -> bool:
        """True when the shard is already at the destination (resume)."""
        return False


def _sha256(path: str) -> str:
    from .. import storage as _storage
    h = hashlib.sha256()
    with _storage.open_read(path) as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


class LocalDirSink(RecordsSink):
    """Copy shards into a managed directory with a JSON manifest
    (name -> {sha256, bytes}). Hardlinks when source and destination
    share a filesystem; falls back to copy."""

    def __init__(self, root: str):
        self.root = root
        self._lock = threading.Lock()
        os.makedirs(root, exist_ok=True)
        self._manifest_path = os.path.join(root, "manifest.json")
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path, "r", encoding="utf-8") as f:
                self.manifest: Dict[str, dict] = json.load(f)
        else:
            self.manifest = {}

    def exists(self, shard_name: str) -> bool:
        return (shard_name in self.manifest
                and os.path.exists(os.path.join(self.root, shard_name)))

    def put_shard(self, path: str) -> str:
        from .. import storage as _storage
        name = _storage.basename(path)
        dest = os.path.join(self.root, name)
        tmp = dest + ".tmp"
        if _storage.is_remote(path):
            # gs:// shard -> local sink (e.g. pulling a bucket's
            # records onto pod-local SSD); stream, don't slurp
            with _storage.open_read(path) as src, open(tmp, "wb") as f:
                shutil.copyfileobj(src, f)
        else:
            try:
                if os.path.exists(tmp):
                    os.unlink(tmp)
                os.link(path, tmp)
            except OSError:
                shutil.copyfile(path, tmp)
        os.replace(tmp, dest)
        entry = {"sha256": _sha256(dest),
                 "bytes": os.path.getsize(dest)}
        with self._lock:  # thread-safety contract of RecordsSink
            self.manifest[name] = entry
            # atomic replace: a crash mid-dump must not truncate the
            # manifest that shard-level resume depends on. Cross-
            # PROCESS pushes to one root still merge through a re-read
            # under an exclusive create (best effort on local fs).
            tmp = self._manifest_path + ".tmp"
            if os.path.exists(self._manifest_path):
                try:
                    with open(self._manifest_path, "r",
                              encoding="utf-8") as f:
                        on_disk = json.load(f)
                    # keep entries another process added since init
                    on_disk.update(self.manifest)
                    self.manifest = on_disk
                except (json.JSONDecodeError, OSError):
                    pass  # our in-memory copy is the best we have
            with open(tmp, "w", encoding="utf-8") as f:
                json.dump(self.manifest, f, indent=1, sort_keys=True)
            os.replace(tmp, self._manifest_path)
        return dest


class SignedURLSink(RecordsSink):
    """HTTP PUT each shard to a presigned URL. ``urls`` maps shard
    basename -> URL (the shape a storage service's
    create-signed-upload-url API returns, parse nb cell 43)."""

    def __init__(self, urls: Dict[str, str], timeout: float = 60.0):
        self.urls = dict(urls)
        self.timeout = timeout
        self.uploaded: List[str] = []

    def put_shard(self, path: str) -> str:
        import urllib.request
        name = os.path.basename(path)
        url = self.urls.get(name)
        if url is None:
            raise KeyError(f"no signed URL provided for shard {name!r}")
        # stream the file object (urllib sends file-likes chunked off
        # disk when Content-Length is set) -- shards run to GBs and
        # must not be materialized in memory for the PUT
        size = os.path.getsize(path)
        with open(path, "rb") as f:
            req = urllib.request.Request(
                url, data=f, method="PUT",
                headers={"Content-Type": "application/octet-stream",
                         "Content-Length": str(size)})
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                if resp.status not in (200, 201, 204):
                    raise IOError(
                        f"upload of {name} failed: HTTP {resp.status}")
        self.uploaded.append(name)
        return url


def push_shards(pattern, sink: RecordsSink,
                resume: bool = True) -> List[str]:
    """Push every shard matching ``pattern`` (glob or list of paths)
    through ``sink``. Skips shards the sink already has when
    ``resume``. Returns the remote identifiers of pushed shards."""
    if isinstance(pattern, str):
        from .. import storage as _storage
        files = _storage.glob(pattern)
    else:
        files = sorted(pattern)
    # aborted writers deliberately leave .tmp files; never push them
    files = [f for f in files if not f.endswith(".tmp")]
    if not files:
        raise FileNotFoundError(f"no shards match {pattern!r}")
    out = []
    skipped = 0
    for f in files:
        if resume and sink.exists(os.path.basename(f)):
            skipped += 1
            continue
        out.append(sink.put_shard(f))
    print(f"pushed {len(out)} shard(s), {skipped} already present")
    return out


def sink_from_dest(dest: str) -> RecordsSink:
    """CLI helper: a path -> LocalDirSink; a path to a JSON file of
    {shard_name: url} -> SignedURLSink."""
    if dest.endswith(".json") and os.path.isfile(dest):
        with open(dest, "r", encoding="utf-8") as f:
            return SignedURLSink(json.load(f))
    return LocalDirSink(dest)

"""Records-sink tests: local dir manifest + resume, signed-URL PUT
against a loopback HTTP server, CLI push."""

import json
import os
import threading

import pytest

from dl_image_segmentation_tpu.records.sink import (LocalDirSink,
                                                    SignedURLSink,
                                                    push_shards,
                                                    sink_from_dest)
from dl_image_segmentation_tpu.records.tfrecord import TFRecordWriter


def make_shards(d, n=3):
    paths = []
    for i in range(n):
        p = os.path.join(d, "t-%.5d-of-%.5d" % (i, n))
        with TFRecordWriter(p) as w:
            w.write(b"payload-%d" % i)
        paths.append(p)
    return paths


class TestLocalDirSink:
    def test_push_manifest_and_resume(self, tmp_path, capsys):
        src = tmp_path / "src"
        src.mkdir()
        paths = make_shards(str(src))
        dest = str(tmp_path / "store")
        sink = LocalDirSink(dest)
        out = push_shards(os.path.join(str(src), "t-*"), sink)
        assert len(out) == 3
        man = json.load(open(os.path.join(dest, "manifest.json")))
        assert len(man) == 3
        for name, meta in man.items():
            assert os.path.getsize(os.path.join(dest, name)) == meta["bytes"]
        # resume: second push transfers nothing
        sink2 = LocalDirSink(dest)
        out2 = push_shards(os.path.join(str(src), "t-*"), sink2)
        assert out2 == []
        assert "3 already present" in capsys.readouterr().out

    def test_no_shards_errors(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            push_shards(str(tmp_path / "none-*"), LocalDirSink(str(tmp_path)))


class TestSignedURLSink:
    def test_put_to_loopback_server(self, tmp_path):
        import http.server

        received = {}

        class Handler(http.server.BaseHTTPRequestHandler):
            def do_PUT(self):
                n = int(self.headers["Content-Length"])
                received[self.path] = self.rfile.read(n)
                self.send_response(200)
                self.end_headers()

            def log_message(self, *a):
                pass

        srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            src = tmp_path / "src"
            src.mkdir()
            paths = make_shards(str(src), n=2)
            port = srv.server_address[1]
            urls = {os.path.basename(p):
                    f"http://127.0.0.1:{port}/up/{os.path.basename(p)}"
                    for p in paths}
            sink = SignedURLSink(urls)
            out = push_shards([str(p) for p in paths], sink)
            assert len(out) == 2
            for p in paths:
                name = os.path.basename(p)
                assert received[f"/up/{name}"] == open(p, "rb").read()
        finally:
            srv.shutdown()

    def test_missing_url_fails_loudly(self, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        paths = make_shards(str(src), n=1)
        with pytest.raises(KeyError, match="no signed URL"):
            SignedURLSink({}).put_shard(paths[0])


class TestCLIPush:
    def test_push_command(self, tmp_path):
        from dl_image_segmentation_tpu.cli import main
        src = tmp_path / "src"
        src.mkdir()
        make_shards(str(src))
        dest = str(tmp_path / "store")
        rc = main(["push", "--records", os.path.join(str(src), "t-*"),
                   "--dest", dest])
        assert rc == 0
        assert len(json.load(open(os.path.join(dest,
                                                "manifest.json")))) == 3

    def test_sink_from_dest_json(self, tmp_path):
        j = tmp_path / "urls.json"
        j.write_text(json.dumps({"a": "http://x/y"}))
        assert isinstance(sink_from_dest(str(j)), SignedURLSink)
        assert isinstance(sink_from_dest(str(tmp_path / "d")), LocalDirSink)


class TestManifestRobustness:
    def test_manifest_atomic_and_merges_concurrent_writers(self, tmp_path):
        """Two sink instances on one root (two host processes of a
        multi-host export): each push must preserve the other's
        manifest entries, and the rewrite is atomic (tmp+replace)."""
        from dl_image_segmentation_tpu.records.sink import LocalDirSink
        s1 = str(tmp_path / "sh-00000-of-00002")
        s2 = str(tmp_path / "sh-00001-of-00002")
        open(s1, "wb").write(b"shard-one")
        open(s2, "wb").write(b"shard-two")
        root = str(tmp_path / "sink")
        a = LocalDirSink(root)
        b = LocalDirSink(root)  # loaded before a pushed anything
        a.put_shard(s1)
        b.put_shard(s2)  # must not clobber a's entry
        import json
        man = json.load(open(os.path.join(root, "manifest.json")))
        assert set(man) == {"sh-00000-of-00002", "sh-00001-of-00002"}
        assert not os.path.exists(
            os.path.join(root, "manifest.json.tmp"))
        c = LocalDirSink(root)
        assert c.exists("sh-00000-of-00002")
        assert c.exists("sh-00001-of-00002")

"""Tests for the in-tree mesh-video viewer (hive_tpu.viewer).

The player page itself is browser-side JS (no JS runtime in CI), so these
tests pin (a) the HTTP server contract — the piece the pipeline's exported
URL depends on — and (b) a feature tripwire: every GLB feature
``hive_tpu.meshing.gltf.export_scene`` can emit must be named in the player
source, so writer extensions fail loudly here instead of rendering wrong.
"""

import http.client
import json
import os
import struct
import threading

import numpy as np
import pytest

from hive_tpu.meshing.gltf import export_scene
from hive_tpu.meshing.mesh import Scene, TriangleMesh
from hive_tpu.viewer import VIEWER_HTML, make_server


@pytest.fixture()
def export_dir(tmp_path):
    video = tmp_path / "seq01"
    video.mkdir()

    tri = TriangleMesh(
        vertices=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
        faces=np.array([[0, 1, 2]], np.int64),
        vertex_colors=np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8),
    )
    bg = Scene()
    bg.add_geometry(tri, node_name="bg")
    export_scene(bg, str(video / "bg.glb"))

    textured = TriangleMesh(
        vertices=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
        faces=np.array([[0, 1, 2]], np.int64),
        uv=np.array([[0, 0], [1, 0], [0, 1]], np.float32),
        texture=np.full((4, 4, 3), 128, np.uint8),
    )
    fg = Scene()
    fg.add_geometry(textured, node_name="000000")
    export_scene(fg, str(video / "fg.glb"))

    (video / "metadata.json").write_text(json.dumps(
        {"fps": 30.0, "fov_y": 61, "num_frames": 1,
         "use_vertex_colour_for_bg": True}))
    return tmp_path


@pytest.fixture()
def server(export_dir):
    srv = make_server(str(export_dir), port=0)  # ephemeral port
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv
    srv.shutdown()


def _get(server, path):
    conn = http.client.HTTPConnection("localhost", server.server_address[1])
    conn.request("GET", path)
    resp = conn.getresponse()
    body = resp.read()
    conn.close()
    return resp, body


def test_root_serves_player(server):
    resp, body = _get(server, "/?video=seq01")
    assert resp.status == 200
    assert resp.getheader("Content-Type").startswith("text/html")
    assert b"parseGLB" in body


def test_exported_artifacts_served(server):
    for path in ("/seq01/bg.glb", "/seq01/fg.glb", "/seq01/metadata.json"):
        resp, body = _get(server, path)
        assert resp.status == 200, path
        assert len(body) > 0

    _, glb = _get(server, "/seq01/bg.glb")
    assert glb[:4] == b"glTF"
    (length,) = struct.unpack_from("<I", glb, 8)
    assert length == len(glb)

    _, meta = _get(server, "/seq01/metadata.json")
    assert json.loads(meta)["num_frames"] == 1


def test_missing_artifact_is_404(server):
    resp, _ = _get(server, "/seq01/missing.glb")
    assert resp.status == 404


class TestGzipSiblings:
    """The pipeline's compression stage leaves X.glb.gz next to X.glb; the
    server must ship those bytes with Content-Encoding: gzip to clients that
    accept it (browsers decode transparently), and plain bytes otherwise."""

    @pytest.fixture()
    def gz_server(self, export_dir):
        from hive_tpu.meshing.gltf import write_gzip_sibling

        write_gzip_sibling(str(export_dir / "seq01" / "bg.glb"))
        srv = make_server(str(export_dir), port=0)
        thread = threading.Thread(target=srv.serve_forever, daemon=True)
        thread.start()
        yield srv
        srv.shutdown()

    @staticmethod
    def _get_with_headers(server, path, headers):
        conn = http.client.HTTPConnection("localhost",
                                          server.server_address[1])
        conn.request("GET", path, headers=headers)
        resp = conn.getresponse()
        body = resp.read()
        conn.close()
        return resp, body

    def test_gzip_served_and_decodes_to_original(self, gz_server, export_dir):
        import gzip

        resp, body = self._get_with_headers(
            gz_server, "/seq01/bg.glb", {"Accept-Encoding": "gzip, deflate"})
        assert resp.status == 200
        assert resp.getheader("Content-Encoding") == "gzip"
        original = (export_dir / "seq01" / "bg.glb").read_bytes()
        assert gzip.decompress(body) == original
        assert len(body) < len(original)

    def test_plain_bytes_without_accept_encoding(self, gz_server, export_dir):
        resp, body = self._get_with_headers(gz_server, "/seq01/bg.glb", {})
        assert resp.status == 200
        assert resp.getheader("Content-Encoding") is None
        assert body == (export_dir / "seq01" / "bg.glb").read_bytes()

    def test_no_sibling_serves_plain(self, gz_server, export_dir):
        resp, body = self._get_with_headers(
            gz_server, "/seq01/fg.glb", {"Accept-Encoding": "gzip"})
        assert resp.status == 200
        assert resp.getheader("Content-Encoding") is None
        assert body == (export_dir / "seq01" / "fg.glb").read_bytes()

    def test_gzip_refusal_q0_serves_plain(self, gz_server, export_dir):
        """``gzip;q=0`` is an explicit refusal (RFC 9110) — a substring
        match would wrongly send gzip bytes the client cannot decode."""
        resp, body = self._get_with_headers(
            gz_server, "/seq01/bg.glb", {"Accept-Encoding": "gzip;q=0"})
        assert resp.status == 200
        assert resp.getheader("Content-Encoding") is None
        assert body == (export_dir / "seq01" / "bg.glb").read_bytes()

    def test_stale_sibling_is_skipped(self, gz_server, export_dir):
        """A .gz older than its base file (out-of-band regeneration) must
        not be served — the plain, current bytes win."""
        base = export_dir / "seq01" / "bg.glb"
        gz = export_dir / "seq01" / "bg.glb.gz"
        os.utime(gz, (1, 1))  # gz mtime far behind the base file

        resp, body = self._get_with_headers(
            gz_server, "/seq01/bg.glb", {"Accept-Encoding": "gzip"})
        assert resp.status == 200
        assert resp.getheader("Content-Encoding") is None
        assert body == base.read_bytes()


def test_player_covers_every_writer_feature(export_dir):
    """Tripwire: each glTF feature export_scene emits is handled in the JS."""
    html = VIEWER_HTML.read_text()

    for video in ("seq01/bg.glb", "seq01/fg.glb"):
        glb = (export_dir / video).read_bytes()
        (length,) = struct.unpack_from("<I", glb, 12)
        gltf = json.loads(glb[20:20 + length])

        for mesh in gltf.get("meshes", []):
            for prim in mesh["primitives"]:
                for attr in prim["attributes"]:
                    if attr == "NORMAL":
                        continue  # unlit player: normals legitimately unused
                    assert attr in html, f"player ignores {attr}"
                index_ct = gltf["accessors"][prim["indices"]]["componentType"]
                # WebGL2 drawElements accepts u8/u16/u32 via componentType.
                assert index_ct in (5121, 5123, 5125)
        for image in gltf.get("images", []):
            assert image["mimeType"] == "image/png"
            assert "image/png" in html or "mimeType" in html

    # Frame-node naming contract (pipeline names fg nodes %06d).
    assert "parseInt" in html
    # Playback contract fields.
    for key in ("fps", "num_frames", "fov_y"):
        assert key in html, f"player ignores metadata.{key}"


def test_webxr_session_contract():
    """The player offers an immersive-vr session (the reference player is a
    WebXR renderer, ref .gitmodules:5-7 / pipeline.py:250-251) and degrades
    to the desktop WebGL2 path when XR is unavailable."""
    html = VIEWER_HTML.read_text()

    # DOM: the Enter-VR button exists and starts hidden (the non-XR default —
    # it is only revealed after isSessionSupported resolves true).
    assert '<button id="xrbtn" hidden>' in html

    # Feature-gated session start: support probe, session request, and the
    # per-eye draw from XRFrame viewer poses.
    for token in ("navigator.xr", "isSessionSupported", '"immersive-vr"',
                  "requestSession", "XRWebGLLayer", "makeXRCompatible",
                  "getViewerPose", "requestReferenceSpace", "getViewport"):
        assert token in html, f"WebXR path is missing {token}"

    # Reference-space fallback chain (headsets without local-floor).
    assert '"local-floor"' in html and '"local"' in html

    # Non-XR fallback: the unsupported-probe path swallows the rejection
    # (button stays hidden) and the desktop render loop keeps running.
    assert ".catch(() => {})" in html
    assert "requestAnimationFrame(render)" in html

"""Tests for the viewer network protocol (reference gaussian_renderer/
network_gui.py) and the multi-scene dispatcher (reference script/run_*.py)."""

import json
import socket
import threading
import time

import numpy as np


def test_network_gui_round_trip():
    from binocular3dgs_tpu.render.network_gui import NetworkGUI

    gui = NetworkGUI(port=0)  # ephemeral port

    wvt = np.eye(4, dtype=np.float32)
    msg = {
        "resolution_x": 8, "resolution_y": 6, "train": True,
        "fov_y": 0.8, "fov_x": 1.0, "z_near": 0.01, "z_far": 100.0,
        "shs_python": False, "rot_scale_python": False, "keep_alive": False,
        "scaling_modifier": 1.0,
        "view_matrix": wvt.reshape(-1).tolist(),
        "view_projection_matrix": wvt.reshape(-1).tolist(),
    }

    received = {}

    def client():
        c = socket.create_connection(("127.0.0.1", gui.port), timeout=5)
        payload = json.dumps(msg).encode()
        c.sendall(len(payload).to_bytes(4, "little") + payload)
        img = b""
        while len(img) < 6 * 8 * 3:
            img += c.recv(6 * 8 * 3 - len(img))
        vlen = int.from_bytes(c.recv(4), "little")
        verify = c.recv(vlen).decode()
        received["img"] = np.frombuffer(img, np.uint8).reshape(6, 8, 3)
        received["verify"] = verify
        c.close()

    t = threading.Thread(target=client)
    t.start()

    def render_fn(req):
        assert req.width == 8 and req.height == 6
        assert req.do_training and not req.keep_alive
        # Y/Z columns must be flipped (reference network_gui.py:73-76)
        assert req.world_view_transform[1, 1] == -1.0
        assert req.world_view_transform[2, 2] == -1.0
        return np.full((req.height, req.width, 3), 0.5, np.float32)

    # poll until connected, then serve exactly one request (sleep between
    # tries: under a loaded CI box the client thread can lag the poll cap)
    for _ in range(500):
        if gui.try_connect():
            break
        time.sleep(0.01)
    gui.serve_step(render_fn, verify="model/path", training_done=False)
    t.join(timeout=5)
    gui.close()

    assert received["verify"] == "model/path"
    assert (received["img"] == 127).all()


def test_dispatcher_protocols_match_reference():
    from binocular3dgs_tpu.orchestrate import PROTOCOLS

    llff = PROTOCOLS["LLFF"]
    assert llff.n_views == 3 and llff.resolution == 2 and llff.iterations == 30000
    dtu = PROTOCOLS["DTU"]
    assert dtu.n_views == 3 and dtu.resolution == 4
    blender = PROTOCOLS["Blender"]
    assert blender.n_views == 8 and blender.iterations == 7000
    assert not blender.run_triangulate  # reference run_blender.py skips it
    assert "--shift_cam_start" in blender.extra_train_flags


def test_dispatcher_runs_scene_pipeline(monkeypatch, tmp_path):
    """dispatch_jobs wires triangulate -> train -> render -> metrics with the
    protocol flags (reference run_llff.py:21-53), without real subprocesses."""
    from binocular3dgs_tpu import orchestrate

    calls = []

    def fake_cli(args, env=None):
        calls.append([str(a) for a in args])
        return 0

    monkeypatch.setattr(orchestrate, "_cli", fake_cli)
    results = orchestrate.dispatch_jobs(
        "LLFF", str(tmp_path), str(tmp_path / "out"), scenes=["fern"], max_workers=1
    )
    assert results == {"fern": True}
    stages = [c[0] for c in calls]
    assert stages == ["triangulate", "train", "render", "metrics"]
    train_call = calls[1]
    assert "--iterations" in train_call and "30000" in train_call

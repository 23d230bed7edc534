"""SIBR remote-viewer socket bridge (gaussian_renderer/network_gui.py).

Speaks the upstream 3DGS viewer protocol: length-prefixed JSON camera
messages in, raw RGB bytes + length-prefixed verify string out. The viewer
sends a row-major view matrix with the y/z columns negated relative to our
convention (:73-76).

Usage inside a training loop (cfg.port > 0):

    gui = NetworkGUI("127.0.0.1", cfg.port)
    ...
    req = gui.poll()
    if req is not None:
        img = render(state, req.camera, ...)["render"]
        gui.send_image(img, source_path)
"""

from __future__ import annotations

import json
import math
import socket
from dataclasses import dataclass

import numpy as np

from ..data.cameras import CameraArrays


@dataclass
class ViewerRequest:
    camera: CameraArrays | None
    do_training: bool = True
    keep_alive: bool = True
    scaling_modifier: float = 1.0


class NetworkGUI:
    def __init__(self, host: str = "127.0.0.1", port: int = 6009):
        self.listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.listener.bind((host, port))
        self.listener.listen()
        self.listener.settimeout(0)
        self.conn = None

    def _try_connect(self):
        try:
            self.conn, addr = self.listener.accept()
            self.conn.settimeout(None)
            print(f"viewer connected: {addr}")
        except (BlockingIOError, socket.timeout):
            pass

    def _read_msg(self) -> dict:
        n = int.from_bytes(self.conn.recv(4), "little")
        buf = b""
        while len(buf) < n:
            buf += self.conn.recv(n - len(buf))
        return json.loads(buf.decode("utf-8"))

    def poll(self) -> ViewerRequest | None:
        """Non-blocking: returns a request when a viewer message is pending."""
        if self.conn is None:
            self._try_connect()
            if self.conn is None:
                return None
        try:
            self.conn.setblocking(False)
            peek = self.conn.recv(1, socket.MSG_PEEK)
            if not peek:
                self.conn = None
                return None
        except (BlockingIOError, socket.timeout):
            return None
        finally:
            if self.conn is not None:
                self.conn.setblocking(True)
        msg = self._read_msg()
        w, h = msg["resolution_x"], msg["resolution_y"]
        if w == 0 or h == 0:
            return ViewerRequest(camera=None,
                                 do_training=bool(msg.get("train", True)),
                                 keep_alive=bool(msg.get("keep_alive", True)))
        view = np.asarray(msg["view_matrix"], np.float32).reshape(4, 4)
        view[:, 1] *= -1
        view[:, 2] *= -1
        proj = np.asarray(msg["view_projection_matrix"],
                          np.float32).reshape(4, 4)
        proj[:, 1] *= -1
        fovx, fovy = msg["fov_x"], msg["fov_y"]
        fx = w / (2 * math.tan(fovx / 2))
        fy = h / (2 * math.tan(fovy / 2))
        cam = CameraArrays(
            viewmatrix=view, projmatrix=proj,
            cam_center=np.linalg.inv(view.T)[:3, 3].astype(np.float32),
            intr=np.array([fx, fy, w / 2, h / 2], np.float32),
            tanfov=np.array([math.tan(fovx / 2), math.tan(fovy / 2)],
                            np.float32),
            image=np.zeros((3, h, w), np.float32),
            normal=np.zeros((3, h, w), np.float32),
            depth=np.zeros((h, w), np.float32),
            mask=np.zeros((h, w), np.int32),
            has_normal=np.asarray(False), has_depth=np.asarray(False),
            has_mask=np.asarray(False), idx=np.asarray(0, np.int32))
        return ViewerRequest(camera=cam,
                             do_training=bool(msg["train"]),
                             keep_alive=bool(msg["keep_alive"]),
                             scaling_modifier=float(msg["scaling_modifier"]))

    def send_image(self, img_chw, verify: str) -> None:
        """img (3,H,W) float [0,1] -> raw byte stream + verify string."""
        if self.conn is None:
            return
        arr = (np.clip(np.asarray(img_chw), 0, 1) * 255).astype(np.uint8)
        raw = arr.transpose(1, 2, 0).tobytes()
        self.conn.sendall(raw)
        self.conn.sendall(len(verify).to_bytes(4, "little"))
        self.conn.sendall(verify.encode("ascii"))

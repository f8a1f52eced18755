"""Display sinks — the output side of the host I/O shell.

The reference blits the shared 1-bpp framebuffer to an SSD1306 OLED (or an
SDL window) from a pthread in a busy loop (`pi_sph_fluid.c:466-470`).  Here a
sink is a consumer of page-packed framebuffers produced on device; the run
loop pushes at most one frame per dispatch and sinks drop frames rather than
block (same tearing-tolerant contract as the reference, made explicit).
"""

from __future__ import annotations

import queue
import sys
import threading

import numpy as np

__all__ = ["NullSink", "TerminalSink", "FileSink", "AsyncSink"]


class NullSink:
    """Benchmark mode: frames are produced and dropped."""

    def push(self, framebuffer: np.ndarray) -> None:
        pass

    def close(self) -> None:
        pass


class TerminalSink:
    """Renders the 128x64 framebuffer as unicode half-blocks (64x32 chars) —
    the desktop_sph_fluid SDL window equivalent for a terminal."""

    def __init__(self, rows: int = 64, cols: int = 128, stream=None):
        self.rows, self.cols = rows, cols
        self.stream = stream or sys.stdout
        self._first = True

    def push(self, framebuffer: np.ndarray) -> None:
        from .native import blit_halfblocks

        frame = blit_halfblocks(np.asarray(framebuffer, np.uint8), self.rows, self.cols)
        if not self._first:
            self.stream.write(f"\x1b[{self.rows // 2}A")  # cursor up, repaint in place
        self._first = False
        self.stream.write(frame)
        self.stream.flush()

    def close(self) -> None:
        pass


class FileSink:
    """Appends raw packed framebuffers to a file (replayable / diffable)."""

    def __init__(self, path: str):
        self.f = open(path, "ab")

    def push(self, framebuffer: np.ndarray) -> None:
        self.f.write(np.asarray(framebuffer, np.uint8).tobytes())

    def close(self) -> None:
        self.f.close()


class PngSink:
    """Writes each frame as an upscaled PNG (frame_000123.png) — the desktop
    analog of the reference's SDL window target (`Makefile:18-23`): a
    graphical view without any display hardware.  Pure-stdlib encoder
    (zlib + PNG chunks), no imaging dependency.
    """

    def __init__(self, path_prefix: str, rows: int = 64, cols: int = 128,
                 scale: int = 4):
        self.prefix = path_prefix
        self.rows, self.cols, self.scale = rows, cols, scale
        self.count = 0

    def _encode(self, img: np.ndarray) -> bytes:
        import struct
        import zlib

        h, w = img.shape
        raw = b"".join(b"\x00" + row.tobytes() for row in img)
        def chunk(tag, data):
            c = tag + data
            return struct.pack(">I", len(data)) + c + struct.pack(
                ">I", zlib.crc32(c) & 0xFFFFFFFF)
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))

    def push(self, framebuffer: np.ndarray) -> None:
        from ..render.metaballs import unpack_framebuffer

        lit = unpack_framebuffer(framebuffer, self.rows, self.cols)
        img = np.where(lit, np.uint8(255), np.uint8(16))
        img = np.repeat(np.repeat(img, self.scale, 0), self.scale, 1)
        with open(f"{self.prefix}_{self.count:06d}.png", "wb") as f:
            f.write(self._encode(img))
        self.count += 1

    def close(self) -> None:
        pass


class AsyncSink:
    """Wraps any sink with the reference's thread decoupling
    (`pi_sph_fluid.c:466-470`): the sim loop never blocks on display I/O.
    Frames are handed off through a depth-1 queue; if the consumer is busy,
    the old frame is dropped (the reference's tearing, made a clean drop)."""

    def __init__(self, inner):
        self.inner = inner
        self.q: queue.Queue = queue.Queue(maxsize=1)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while not self._stop.is_set():
            try:
                frame = self.q.get(timeout=0.1)
            except queue.Empty:
                continue
            self.inner.push(frame)

    def push(self, framebuffer: np.ndarray) -> None:
        try:
            self.q.put_nowait(framebuffer)
        except queue.Full:
            try:  # replace the stale frame
                self.q.get_nowait()
            except queue.Empty:
                pass
            try:
                self.q.put_nowait(framebuffer)
            except queue.Full:
                pass

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=1.0)
        self.inner.close()

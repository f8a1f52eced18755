"""Live browser display sink — the desktop SDL-window analog.

The reference's desktop build opens an SDL window emulating the OLED
(`Makefile:18-23`, `pi_sph_fluid.c:8`).  Here the analog is a zero-
dependency localhost HTTP server: ``WebSink`` keeps the latest page-packed
framebuffer and serves

    /        a canvas page that polls and draws frames (~30 Hz)
    /frame   the raw framebuffer bytes (SSD1306 page packing, byte
             ``i//8*cols + j``, bit ``i%8`` — unpacked client-side)
    /meta    {"rows": R, "cols": C, "frames": N}

Wrap in io.display.AsyncSink like every other sink so the sim loop never
blocks on a slow client (the reference's tearing-tolerant contract).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

__all__ = ["WebSink"]

_PAGE = """<!doctype html>
<html><head><title>pi_sph_fluid_tpu</title><style>
 body { background:#111; color:#9ae; font-family:monospace; text-align:center }
 canvas { image-rendering: pixelated; border:1px solid #345; margin-top:2em }
</style></head><body>
<h3>pi_sph_fluid_tpu &mdash; live</h3>
<canvas id=c></canvas><div id=s></div>
<script>
const cv = document.getElementById('c'), st = document.getElementById('s');
let rows = 64, cols = 128, scale = 6, frames = 0;
async function meta() {
  const m = await (await fetch('/meta')).json();
  rows = m.rows; cols = m.cols;
  cv.width = cols; cv.height = rows;
  cv.style.width = (cols * scale) + 'px';
  cv.style.height = (rows * scale) + 'px';
}
async function tick() {
  try {
    const buf = new Uint8Array(await (await fetch('/frame')).arrayBuffer());
    const ctx = cv.getContext('2d');
    const img = ctx.createImageData(cols, rows);
    for (let i = 0; i < rows; i++) for (let j = 0; j < cols; j++) {
      const lit = (buf[(i >> 3) * cols + j] >> (i & 7)) & 1;
      const o = ((rows - 1 - i) * cols + j) * 4;   // y-up like the sim
      img.data[o] = lit ? 160 : 12; img.data[o+1] = lit ? 210 : 14;
      img.data[o+2] = lit ? 255 : 22; img.data[o+3] = 255;
    }
    ctx.putImageData(img, 0, 0);
    st.textContent = 'frame ' + (++frames);
  } catch (e) { st.textContent = 'disconnected'; }
  setTimeout(tick, 33);
}
meta().then(tick);
</script></body></html>"""


class WebSink:
    """Serves the latest framebuffer to a browser on localhost."""

    def __init__(self, port: int = 8742, rows: int = 64, cols: int = 128):
        self.rows, self.cols = rows, cols
        self._frame = bytes(rows // 8 * cols)
        self._count = 0
        self._lock = threading.Lock()
        sink = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):   # quiet
                pass

            def do_GET(self):
                if self.path == "/frame":
                    with sink._lock:
                        body = sink._frame
                    ctype = "application/octet-stream"
                elif self.path == "/meta":
                    with sink._lock:
                        body = json.dumps({
                            "rows": sink.rows, "cols": sink.cols,
                            "frames": sink._count}).encode()
                    ctype = "application/json"
                else:
                    body = _PAGE.encode()
                    ctype = "text/html"
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(body)

        self._httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()
        print(f"web display: http://127.0.0.1:{self.port}/", flush=True)

    def push(self, framebuffer: np.ndarray) -> None:
        with self._lock:
            self._frame = np.asarray(framebuffer, np.uint8).tobytes()
            self._count += 1

    def close(self) -> None:
        self._httpd.shutdown()
        self._thread.join(timeout=1.0)

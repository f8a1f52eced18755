"""Native host-I/O runtime (csrc/host_io.c): build, blit parity, pacing."""

import time

import numpy as np
import pytest

from pi_sph_fluid_tpu.io import native
from pi_sph_fluid_tpu.render.metaballs import pack_framebuffer, unpack_framebuffer


def test_native_library_builds_and_loads():
    assert native.native_available(), "gcc build of csrc/host_io.c failed"


def test_blit_matches_python_fallback():
    rng = np.random.default_rng(0)
    lit = rng.random((64, 128)) > 0.7
    fb = np.asarray(pack_framebuffer(lit, 64, 128), np.uint8)
    native_out = native.blit_halfblocks(fb, 64, 128)
    # recompute via the pure-Python path
    img = unpack_framebuffer(fb, 64, 128)
    glyphs = np.asarray([" ", "▀", "▄", "█"])
    chars = glyphs[img[0::2].astype(int) + 2 * img[1::2].astype(int)]
    py_out = "\n".join("".join(r) for r in chars) + "\n"
    assert native_out == py_out


def test_pace_until_hits_deadline():
    if not native.native_available():
        pytest.skip("no native lib")
    lib = native.load()
    now = float(lib.sph_monotonic_s())
    overshoot = native.pace_until(now + 0.02)
    assert 0.0 <= overshoot < 5e-3  # sub-ms typical; generous CI margin


def test_gravity_sysfs_missing_device_returns_none():
    assert native.read_gravity_sysfs("/nonexistent/iio:device0", 9.81) is None

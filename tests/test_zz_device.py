import jax
def test_devices():
    print("BACKEND:", jax.default_backend(), "N:", len(jax.devices()))

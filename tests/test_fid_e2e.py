"""FID pipeline smoke: random Inception params over synthetic image sets."""

import numpy as np
import pytest


@pytest.mark.slow
def test_fid_inception_e2e(tmp_path, rng_np):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from freefine_tpu.metrics.fid import fid_inception
    from freefine_tpu.models.inception import InceptionV3FID

    model = InceptionV3FID()
    params = model.init(jax.random.key(0), jnp.zeros((1, 299, 299, 3)))

    def write_set(prefix, shift, n=4):
        paths = []
        for i in range(n):
            img = (rng_np.random((32, 32, 3)) * 127 + shift).astype(np.uint8)
            p = str(tmp_path / f"{prefix}_{i}.png")
            Image.fromarray(img).save(p)
            paths.append(p)
        return paths

    a = write_set("a", 0)
    b = write_set("b", 120)
    same = fid_inception(a, a, params, batch_size=2)
    diff = fid_inception(a, b, params, batch_size=2)
    assert abs(same) < 1e-3
    assert diff > same

"""3d<->2d conv parameter conversion: bit-identical forward."""

import jax
import jax.numpy as jnp
import numpy as np

from selavi_tpu.models.convert import (
    video_params_2d_to_3d,
    video_params_3d_to_2d,
)
from selavi_tpu.models.r2plus1d import R2Plus1D18


def test_conversion_roundtrip_and_forward_parity():
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 4, 32, 32, 3)
    ).astype(np.float32))

    m3 = R2Plus1D18(conv_impl="3d")
    v3 = m3.init(jax.random.PRNGKey(0), x, train=False)
    out3 = m3.apply(v3, x, train=False)

    m2 = R2Plus1D18(conv_impl="2d")
    p2 = video_params_3d_to_2d(v3["params"])
    out2 = m2.apply(
        {"params": p2, "batch_stats": v3["batch_stats"]}, x, train=False
    )
    np.testing.assert_allclose(
        np.asarray(out3), np.asarray(out2), rtol=1e-5, atol=1e-5
    )

    # round trip is exact
    p3_again = video_params_2d_to_3d(p2)
    for a, b in zip(jax.tree.leaves(v3["params"]), jax.tree.leaves(p3_again)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

"""Spatial (H-dim) sharding — the CP/SP analog for >1024^2 scenes
(SURVEY §5: "2-D spatial sharding via GSPMD plays the role CP plays in LLM
stacks").  XLA inserts conv halo exchanges and pooling all-reduces
automatically; this test proves the sharded forward equals the unsharded one.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from segland_tpu.models import build_model
from segland_tpu.dist import make_mesh


@pytest.mark.slow
def test_spatial_sharded_forward_matches():
    model = build_model("pspnet_pop", backbone="resnet10", n_base=7)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(1), img, train=False)

    f = jax.jit(lambda v, x: model.apply(v, x, train=False))
    want = np.asarray(f(variables, img))

    mesh = make_mesh(4)
    img_s = jax.device_put(img, NamedSharding(mesh, P(None, "data")))  # shard H
    got = np.asarray(f(variables, img_s))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)

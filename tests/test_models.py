

"""Model-composition tests."""

import jax
import numpy as np


def test_deep_gp_variants_train():
    """Checkerboard (Gram head) and 3-layer deep-GP compositions
    (Coordinates-checkerboard.ipynb / Deep Coordinates.ipynb) train with
    decreasing loss."""
    import importlib.util
    import os

    import optax

    from gpzoo_tpu.train import TrainState, make_train_step

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "deep_coordinates.py")
    spec = importlib.util.spec_from_file_location("deep_coordinates", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    key = jax.random.PRNGKey(0)
    for build in (mod.build_checkerboard, mod.build_three):
        model, x, y = build(key, n=80, m=16)
        opt = optax.adam(5e-3)
        state = TrainState.create(model, opt, key)
        step = make_train_step(mod.stack_loss, opt, static_kwargs={"E": 2})
        losses = []
        for _ in range(25):
            state, loss = step(state, x, y)
            losses.append(float(loss))
        assert np.all(np.isfinite(losses)), build.__name__
        assert losses[-1] < losses[0], build.__name__

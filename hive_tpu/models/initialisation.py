"""Fast random parameter initialisation for the weights-absent fallback.

``model.init`` JIT-compiles the full initialiser graph — tens of seconds for
DPT-Hybrid on a 1-core CPU host, paid on every process that falls back to
random weights (the reference never has this path: its runtime image ships
real checkpoints, ref Dockerfile.runtime:81-88). ``jax.eval_shape`` runs the
same trace abstractly (no XLA compile), and the parameters are then
materialised host-side: norm scales 1, biases 0, everything else N(0, 0.02).

Only the weights-absent fallback uses this — outputs are uncalibrated there
by definition; converted checkpoints bypass it entirely.
"""

import numpy as np


def fast_random_params(model, *dummy_args, seed: int = 0):
    """Random Flax parameters by shape inference only (no initialiser compile).

    :param model: a Flax module.
    :param dummy_args: example inputs for ``model.init``.
    :return: a params tree matching ``model.init(...)["params"]`` in
        structure, shapes, and dtypes.
    """
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            *dummy_args)["params"]
    rng = np.random.default_rng(seed)

    def materialise(path, leaf):
        tail = path[-1]
        name = tail.key if hasattr(tail, "key") else str(tail)
        if name == "scale":          # Layer/Group/BatchNorm scales
            host = np.ones(leaf.shape, np.float32)
        elif name == "bias":
            host = np.zeros(leaf.shape, np.float32)
        else:                        # kernels, embeddings, cls tokens, ...
            host = rng.standard_normal(leaf.shape, dtype=np.float32)
            host *= 0.02
        return jnp.asarray(host, dtype=leaf.dtype)

    return jax.tree_util.tree_map_with_path(materialise, shapes)

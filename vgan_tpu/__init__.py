"""vgan_tpu — a TPU-native (JAX/XLA/Pallas) subspace-generation framework.

A ground-up rebuild of the capabilities of jcribeiro98/V-GAN (adversarial
subspace generation for outlier detection in high-dimensional data,
arXiv:2504.07522) designed TPU-first:

- the full train step (sample z -> generate mask U -> project -> MMD ->
  backward -> Adadelta update) compiles to a single XLA graph, with whole
  epochs running as one ``lax.scan`` on device;
- the O(n^2 d) multi-bandwidth RBF Gram / squared-MMD computation is a fused,
  block-tiled Pallas kernel with a custom VJP (the Gram matrix is never
  materialized in HBM);
- scaling is expressed over a ``jax.sharding.Mesh``: batch rows are
  data-parallel with a ring-`ppermute` exchange for cross-shard Gram tiles,
  and the feature axis of the Gram can be sharded (partial squared distances
  are additive over features -> one ``psum``);
- thousands of subspace realizations are scored in one ``vmap`` launch for
  subspace-ensemble outlier detection.

Public API mirrors the reference estimators (see /root/reference/src/vgan.py):
``VGAN`` (kernel learning) and ``VGAN_no_kl``.
"""

__version__ = "0.1.0"

__all__ = [
    "VGAN",
    "VGAN_no_kl",
    "SubspaceEnsemble",
    "HeterogeneousEnsemble",
    "TrainConfig",
    "__version__",
]


def __getattr__(name):
    # Lazy: importing vgan_tpu.ops alone must not pull in the full estimator
    # stack (keeps kernel-only users light and avoids import cycles).
    if name in ("VGAN", "VGAN_no_kl"):
        from vgan_tpu.api import vgan as _vgan

        return getattr(_vgan, name)
    if name in ("SubspaceEnsemble", "HeterogeneousEnsemble"):
        import vgan_tpu.ensemble as _ens

        return getattr(_ens, name)
    if name == "TrainConfig":
        from vgan_tpu.train.steps import TrainConfig

        return TrainConfig
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")

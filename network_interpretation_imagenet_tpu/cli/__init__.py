"""CLI entry points mirroring the reference scripts (BASELINE.json: "Public
API mirrors the reference scripts").

Run as modules, e.g.::

    python -m network_interpretation_imagenet_tpu.cli.bayesian_active_learning_imagenet --synthetic
    python -m network_interpretation_imagenet_tpu.cli.generate_gp_training_data_mnist --mode gp-data
    python -m network_interpretation_imagenet_tpu.cli.gp_regression --masks masks.npz --gp-mode train

Every script works without real datasets via ``--synthetic`` (deterministic
generated images); with ``--data DIR`` they consume the same on-disk layouts
the reference uses (ImageNet-localization val dir + LOC_val_solution.csv,
MNIST IDX files, CIFAR-10 python batches).
"""

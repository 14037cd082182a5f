"""Mesh-based parallelism (pjit/shard_map over ICI).

First-class replacement for the reference's vestigial distributed backend:
``--world-size/--dist-url/--dist-backend gloo`` flags are parsed but
``torch.distributed`` is never initialized
(``bayesian_active_learning_imagenet.py:78-83,384``), and the only real
parallelism is single-host ``nn.DataParallel``
(``generate_gp_training_data_cifar.py:75-78``).

Here: a ("data", "model") mesh; the mask/image batch shards over "data"
(ICI all-reduce for metrics), and wide channels + classifier head optionally
shard over "model" (tensor parallelism — XLA inserts the collectives from
sharding annotations). The same code runs on a virtual CPU mesh for tests
and on real slices.
"""

from network_interpretation_imagenet_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    replicate,
    shard_batch,
)
from network_interpretation_imagenet_tpu.parallel.sharded_engine import (  # noqa: F401
    sharded_knockout_eval,
    sharded_knockout_eval_multi,
    sharded_window_eval,
    sharded_window_eval_multi,
)
from network_interpretation_imagenet_tpu.parallel.train_step import (  # noqa: F401
    make_sharded_train_step,
)

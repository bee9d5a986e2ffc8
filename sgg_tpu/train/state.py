"""Train state and optimizer assembly.

Rebuild of the reference optimizer setup (``/root/reference/lib/pytorch_misc.py:130-157``
+ ``main.py:238``): SGD with momentum 0.9, weight decay ``l2``, effective
learning rate ``lr * batch_size``, the VGG fully-connected RoI heads
(``roi_fmap*``) at 1/10th LR, MultiStepLR decay by ``lr_decay`` at epochs
``steps + 1``, and global grad-norm clipping at ``clip``
(``main.py:118 -> pytorch_misc.py:625``). The frozen detector trunk
(``main.py:62-63``) is excluded from updates via an optax partition.

TPU-native shape: one optax ``GradientTransformation`` over the param pytree
with label-based partitioning — no named-parameter loops, fully
jit-compatible, checkpointable as a pytree.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct

from sgg_tpu.config import Config


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt_state)

    def replace(self, **kw) -> "TrainState":
        import dataclasses
        return dataclasses.replace(self, **kw)


def _param_label(path) -> str:
    keys = [getattr(k, "key", str(k)) for k in path]
    if any("trunk" in str(k) for k in keys):
        return "frozen"
    if any(str(k).startswith("roi_fmap") for k in keys):
        return "fc"  # 1/10th LR (pytorch_misc.py:133-140)
    return "main"


def param_labels(params) -> Any:
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _param_label(path), params)


def multistep_lr(base_lr: float, steps: Sequence[int], decay: float,
                 steps_per_epoch: int) -> optax.Schedule:
    """MultiStepLR over epochs (milestones = steps + 1, pytorch_misc.py:151-153)."""
    boundaries = {(s + 1) * steps_per_epoch: decay for s in steps}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_optimizer(config: Config, params,
                   steps_per_epoch: int = 1) -> optax.GradientTransformation:
    """SGD(momentum=0.9, weight_decay=l2) with FC-group 1/10 LR, clip, and
    frozen trunk."""
    eff_lr = config.lr * config.batch_size  # main.py:238 (num_gpus folded
    # into the data-parallel batch)

    def sgd(lr_scale: float) -> optax.GradientTransformation:
        schedule = multistep_lr(eff_lr * lr_scale, config.steps,
                                config.lr_decay, steps_per_epoch)
        return optax.chain(
            optax.add_decayed_weights(config.l2),
            optax.sgd(schedule, momentum=0.9),
        )

    tx = optax.multi_transform(
        {"main": sgd(1.0), "fc": sgd(0.1), "frozen": optax.set_to_zero()},
        param_labels(params))
    return optax.chain(optax.clip_by_global_norm(config.clip), tx)


def create_train_state(config: Config, variables: Dict[str, Any],
                       steps_per_epoch: int = 1) -> TrainState:
    params = variables["params"]
    tx = make_optimizer(config, params, steps_per_epoch)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        tx=tx,
    )

"""Learning-rate schedule: halve every ``lr_decay_epoch`` epochs.

Step-based equivalent of exp_lr_scheduler (utils/learning_helpers.py:53-67):
lr(step) = base * 0.5^(epoch // decay) with epoch = step // steps_per_epoch.
(The reference's hard-coded epoch-70..75 halvings are unreachable at the
paper's 20-epoch budget and are not reproduced.)
"""

from __future__ import annotations


def halving_schedule(base_lr: float, steps_per_epoch: int, decay_epochs: int):
    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * (0.5 ** (epoch // max(decay_epochs, 1)))

    return schedule

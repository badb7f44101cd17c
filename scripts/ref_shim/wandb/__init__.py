"""No-op wandb stand-in for the reference subprocess.

The reference *requires* wandb (TrainingConfig's root_validator raises when
use_wandb is False, /root/reference/graph_hscn/config/config.py:146-152) and
calls init/log/finish (main.py:98,120; train/train.py:177,192;
train_clustering.py:52).  No network egress exists here, so every call is a
no-op; the training math is unaffected (wandb is logging-only in the
reference).
"""


class _Run:
    def __init__(self, **kwargs):
        self.config = kwargs

    def log(self, *a, **k):
        pass

    def finish(self):
        pass


run = None


def init(*args, **kwargs):
    global run
    run = _Run(**kwargs)
    return run


def log(*args, **kwargs):
    pass


def finish(*args, **kwargs):
    pass

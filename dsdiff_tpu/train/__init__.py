from . import (adversarial, checkpoints, config, latent, schedule_sampler,
               state, step, surgery, trainer, vae_trainer)
from .config import Config, load_config, load_run_config, merge
from .state import TrainState, cosine_lr, make_optimizer
from .step import TaskConfig, make_sample_fn, make_train_step
from .trainer import Trainer

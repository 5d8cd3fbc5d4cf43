from .disc_unet import DiscUNet
from .dit import DIT_CONFIGS, DiT, make_dit
from .dsunet import DSUNet
from .unet import UNet
from .vae import AutoencoderKL, DiagonalGaussian
from .wrapper import MODEL_REGISTRY, build_model, conditioned_call

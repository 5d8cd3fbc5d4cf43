from .disc_unet import DiscUNet
from .discriminator import PatchDiscriminator
from .dit import DIT_CONFIGS, DiT, make_dit
from .dsunet import DSUNet
from .encoders import (
    ClassEmbedder,
    CLIPImageEmbedder,
    CLIPTextEmbedder,
    EmbeddingNoiseAugmentation,
    unclip_adm_cond,
)
from .encoder_unet import EncoderUNet, classifier_gradient
from .seg_unet import FFParser, SegUNet, sliding_window_inference
from .unet import UNet
from .vae import AutoencoderKL, DiagonalGaussian
from .wrapper import MODEL_REGISTRY, build_model, conditioned_call

from . import assemble, fid, metrics, perceptual, suv, visualize
from .assemble import VolumeAssembler, evaluate_predictions, write_metric_report
from .metrics import evaluate_volume

from . import curriculum, h5store, nifti, pipeline, preprocess, transforms
from .nifti import Nifti, read_nifti, write_nifti
from .pipeline import BatchLoader, SliceDataset

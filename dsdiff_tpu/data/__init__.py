from . import (curriculum, h5store, nifti, nnunet_export, npy_dataset,
               pipeline, preprocess, transforms)
from .nifti import Nifti, read_nifti, write_nifti
from .pipeline import BatchLoader, SliceDataset

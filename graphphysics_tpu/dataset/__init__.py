from graphphysics_tpu.dataset.dataset import BaseDataset
from graphphysics_tpu.dataset.h5_dataset import H5Dataset
from graphphysics_tpu.dataset.loader import GraphLoader
from graphphysics_tpu.dataset.preprocessing import build_preprocessing
from graphphysics_tpu.dataset.sample import RawSample, meshdata_to_sample
from graphphysics_tpu.dataset.xdmf_dataset import XDMFDataset

__all__ = [
    "BaseDataset",
    "H5Dataset",
    "XDMFDataset",
    "GraphLoader",
    "RawSample",
    "meshdata_to_sample",
    "build_preprocessing",
]

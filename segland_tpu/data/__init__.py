from .oem import OEMTrainDataset, OEMValDataset
from .oem_ft import OEMFtTrainDataset
from .loader import Loader

# registry replacing eval('dataset.'+name+...) (reference train_base.py:151)
DATASETS = {
    "oem": (OEMTrainDataset, OEMValDataset),
    "oem_ft": (OEMFtTrainDataset, OEMValDataset),
}

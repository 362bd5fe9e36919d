from .dataset import SyntheticDataset, YOLODataset, check_det_dataset
from .build import DataLoader, build_dataloader, collate

__all__ = ["SyntheticDataset", "YOLODataset", "check_det_dataset", "DataLoader",
           "build_dataloader", "collate"]

from .dataset import (ClassificationDataset, GroundingDataset, SyntheticDataset,
                      YOLODataset, check_det_dataset)
from .build import DataLoader, build_dataloader, collate

__all__ = ["ClassificationDataset", "GroundingDataset", "SyntheticDataset",
           "YOLODataset", "check_det_dataset", "DataLoader", "build_dataloader",
           "collate"]

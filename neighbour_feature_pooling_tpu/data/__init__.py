"""Host-side input pipelines."""

from .datamodules import (  # noqa: F401
    DATASET_NUM_CLASSES,
    ArrayDataModule,
    CIFAR10DataModule,
    DataModule,
    EuroSATDataModule,
    FashionMNISTDataModule,
    FolderDataModule,
    GTOSMobileDataModule,
    MSTARDataModule,
    PlantVillageDataModule,
    RESISC45DataModule,
    SugarcaneDamageUSADataModule,
    SyntheticDataModule,
    UCMercedDataModule,
    get_datamodule,
)
from .prefetch import prefetch  # noqa: F401
from .transforms import (  # noqa: F401
    IMAGENET_MEAN,
    IMAGENET_STD,
    TransformConfig,
    eval_transform,
    train_transform,
)

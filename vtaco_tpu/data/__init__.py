from vtaco_tpu.data.core import (
    BatchLoader,
    Shapes3dDataset,
    collate_batch,
    get_dataset,
)
from vtaco_tpu.data.fields import (
    Field,
    IndexField,
    PartialPointCloudField,
    PatchPointCloudField,
    PatchPointsField,
    PointCloudField,
    PointsField,
    VoxelsField,
)
from vtaco_tpu.data.transforms import (
    Compose,
    PointcloudNoise,
    SubsamplePointcloud,
    SubsamplePoints,
)

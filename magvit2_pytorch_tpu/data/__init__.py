from magvit2_pytorch_tpu.data.datasets import (
    DataLoader,
    ImageDataset,
    VideoDataset,
    collate_arrays_and_strings,
    cycle,
    random_split,
)
from magvit2_pytorch_tpu.data.video_io import (
    array_to_video,
    cast_num_frames,
    crop_center,
    gif_to_array,
    video_array_to_gif,
    video_tensor_to_gif,
    video_to_array,
)

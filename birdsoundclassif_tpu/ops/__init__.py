from .anchors import generate_base_anchors, generate_anchor_shifts, full_anchor_grid  # noqa: F401
from .boxes import (  # noqa: F401
    iou_matrix,
    encode_boxes,
    decode_boxes,
    clip_boxes,
    coord_to_rel,
    rel_to_coord,
)
from .nms import greedy_nms, batched_greedy_nms  # noqa: F401
from .image import (  # noqa: F401
    resize_bilinear_align_corners,
    adaptive_avg_pool,
)
from .posenc import one_dim_positional_encoding, sine_position_embedding_2d  # noqa: F401

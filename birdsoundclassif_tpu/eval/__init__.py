from .ap import (  # noqa: F401
    compute_AP_scores,
    calculate_ap,
    format_txt_annots,
    read_annot_file,
)

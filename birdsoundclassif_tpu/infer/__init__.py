from .pipeline import run_detection, load_model, merge_detections  # noqa: F401

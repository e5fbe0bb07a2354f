from .export import export_inference_fn, load_exported

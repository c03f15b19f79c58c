from .flags import build_parser, finalize_options, save_options, load_options

from .params import check_params, flatten_dict, nest_dict, nested_update
from .logging import deco_print, get_logger
from .metrics import levenshtein, word_error_rate

from ganecdotes_tpu.utils.util import (
    get_logger,
    load_config,
    seed_everything,
    ConfigLoader,
)

from ganecdotes_tpu.utils.util import (
    get_logger,
    load_config,
    seed_everything,
    send_email_notification,
    ConfigLoader,
)
from ganecdotes_tpu.utils.fits import read_fits_data, save_fits_data

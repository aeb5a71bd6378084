"""Cross-cutting utilities: logging, config loading, seeding, CLI helpers.

TPU-native counterpart of the reference's lib/util/util.py:21-260 (logger
factory, importlib config loader, global seeding, ConfigLoader). JAX has no
global RNG, so ``seed_everything`` only seeds numpy/python and returns a
jax.random key for explicit threading.
"""

import argparse
import importlib.util
import logging
import os
import random
import sys

import numpy as np


def get_logger(name, logfile=None, level=logging.INFO):
    """Logger with stdout + optional file handler (ref lib/util/util.py:50-83)."""
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.propagate = False

    # avoid duplicate handlers when called repeatedly in one process
    logger.handlers = []

    fmt = logging.Formatter("%(asctime)s %(name)s %(levelname)s: %(message)s")

    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)

    if logfile is not None:
        os.makedirs(os.path.dirname(os.path.abspath(logfile)), exist_ok=True)
        fh = logging.FileHandler(logfile)
        fh.setFormatter(fmt)
        logger.addHandler(fh)

    return logger


def load_config(config_path, config_name="config"):
    """Exec a python-module config file and return the module object.

    Mirrors the reference's importlib loader (lib/util/util.py:31-46) so
    configs remain plain python modules whose attributes are hyperparameters.
    """
    spec = importlib.util.spec_from_file_location(config_name, config_path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def seed_everything(seed=42):
    """Seed host-side RNGs; return a jax PRNG key for explicit threading.

    The reference pins seed 42 + cudnn-determinism at import
    (lib/util/util.py:21-28); in JAX determinism comes from explicit keys.
    """
    random.seed(seed)
    np.random.seed(seed)
    import jax

    return jax.random.PRNGKey(seed)


class ConfigLoader(object):
    """Expose every attribute of a config module as a CLI flag.

    Counterpart of the reference's ConfigLoader (lib/util/util.py:87-135):
    any non-dunder scalar attribute becomes ``--<name>`` with its config value
    as default; parsed values overwrite the module attributes.
    """

    def __init__(self, config_path, config_name="config", description=""):
        self.config = load_config(config_path, config_name)
        self.parser = argparse.ArgumentParser(description=description)

        def parse_bool(s):
            # type=bool would make bool('False') == True; accept the usual
            # spellings so bool flags can actually be turned off from the CLI
            if isinstance(s, bool):
                return s
            if s.lower() in ("1", "true", "yes", "on"):
                return True
            if s.lower() in ("0", "false", "no", "off"):
                return False
            raise argparse.ArgumentTypeError(f"not a boolean: {s!r}")

        for key in dir(self.config):
            if key.startswith("__"):
                continue
            val = getattr(self.config, key)
            if isinstance(val, bool):
                self.parser.add_argument(
                    f"--{key}", default=val, type=parse_bool, required=False
                )
            elif isinstance(val, (int, float, str)):
                self.parser.add_argument(
                    f"--{key}", default=val, type=type(val), required=False
                )

    def parse(self, argv=None):
        args, _ = self.parser.parse_known_args(argv)
        for key, val in vars(args).items():
            setattr(self.config, key, val)
        return self.config


def send_email_notification(body, pswd, receiver=None, sender=None,
                            subject="Email Auto-alert",
                            smtp_host="smtp.gmail.com", smtp_port=465):
    """Send a plain-text alert email over SMTP-SSL (ref lib/util/util.py:224-259).

    Credentials are passed in, never stored. Raises on missing addresses or
    SMTP failures so callers can decide whether alerts are fatal.
    """
    import smtplib
    import time as _time
    from email.mime.multipart import MIMEMultipart
    from email.mime.text import MIMEText

    if not (sender and receiver):
        raise ValueError("send_email_notification requires sender and receiver")

    msg = MIMEMultipart()
    msg["From"] = sender
    msg["To"] = receiver
    msg["Subject"] = subject or (
        "ganecdotes_tpu alert: "
        + _time.strftime("%m-%d-%Y %H:%M:%S", _time.localtime())
    )
    msg.attach(MIMEText(body))

    server = smtplib.SMTP_SSL(smtp_host, smtp_port)
    try:
        server.ehlo()
        server.login(sender, pswd)
        server.sendmail(sender, receiver, msg.as_string())
    finally:
        server.close()

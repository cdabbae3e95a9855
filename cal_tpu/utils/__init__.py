from cal_tpu.utils.config import Config, default_config

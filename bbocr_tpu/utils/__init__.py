from bbocr_tpu.utils.env import env_flag, on_tpu

from ethzasl_brisk_tpu.vo.frontend import VoConfig, VoFrontend

__all__ = ["VoConfig", "VoFrontend"]

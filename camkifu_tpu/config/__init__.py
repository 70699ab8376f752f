from camkifu_tpu.config import cvconf, guiconf  # noqa: F401

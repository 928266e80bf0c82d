"""Extension hook for user-defined config keys.

Parity with /root/reference/audio_slowfast/config/custom_config.py:7.
"""


def add_custom_config(_C):
    # Add your own customized configs here.
    pass

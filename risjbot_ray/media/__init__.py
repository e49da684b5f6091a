"""Pure-numpy media codecs for the multimodal pipeline stages.

Formats whose wire layout is simple enough to decode without external
libraries (BMP, PPM/PGM, RIFF-PCM WAV, YUV4MPEG2) are decoded for real;
everything else (JPEG, MP4, ...) stays behind the clearly-marked stub
boundary in ``risjbot_ray.pipelines.multimodal``.
"""

"""Arithmetic-coded JPEG (SOF9): the QM-coder decode path.

Every arithmetic fixture here was ENCODED by the system libjpeg62-turbo
(``cinfo.arith_code = TRUE``) from a deterministic synthetic image, and
is paired with a HUFFMAN twin: the same image encoded by the same
library at the same quality with ``arith_code = FALSE``. Identical
quantization + DCT means the two files carry identical quantized DC
coefficients, so the pure-Python arithmetic decoder's DC-scale result
must equal the (independently validated) Huffman decoder's result
EXACTLY - a tolerance-free, spec-grounded oracle that no shared bug can
satisfy, since the two decoders share no entropy-layer code. Fixture
generator: a ~50-line C program over jpeglib (compress a PGM/PPM with
arith_code TRUE/FALSE) - see the round-12 notes in SCALE.md.

Pillow cannot decode arithmetic JPEG at all, so this path EXCEEDS the
imaging-library seam rather than approximating it.
"""

from __future__ import annotations

import base64

from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.multimodal import (
    _QM_TAB,
    _ArithmeticJpegError,
    _decode_image_jpeg_dc,
    _decode_image_jpeg_dc_arith,
    decode_image,
)


def _b64(*chunks: str) -> bytes:
    return base64.b64decode("".join(chunks))


# 16x16 gray, q90, single component
_A_G16 = _b64(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAMCAgMCAgMDAwMEAwMEBQgFBQQEBQoH"
    "BwYIDAoMDAsKCwsNDhIQDQ4RDgsLEBYQERMUFRUVDA8XGBYUGBIUFRT/yQALCAAQ"
    "ABABAREA/8wABgAQEAX/2gAIAQEAAD8A/wDX4mNXoJ2FYRHmth5HbNc90EAcihWf"
    "6iiC7JhPlbUdqCrS9HsZocJoai5/9i2wkRup7B68TvBsOZwf/prvVNylKpnds3Bc"
    "BhZ4y/AVAyXJhfF1OJ2+hniFF2RRJsOy1Pya8/bl+4zU06U6M7Myhz97a2UNUs1E"
    "2avb1YrXZYA2WuMBuwi0KLs4ApvUc3w/y/hdZI5LKgkK1XJzdjv/2Q=="
)
_H_G16 = _b64(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAMCAgMCAgMDAwMEAwMEBQgFBQQEBQoH"
    "BwYIDAoMDAsKCwsNDhIQDQ4RDgsLEBYQERMUFRUVDA8XGBYUGBIUFRT/wAALCAAQ"
    "ABABAREA/8QAHwAAAQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgED"
    "AwIEAwUFBAQAAAF9AQIDAAQRBRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2Jy"
    "ggkKFhcYGRolJicoKSo0NTY3ODk6Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1"
    "dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ipqrKztLW2t7i5usLDxMXGx8jJ"
    "ytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/9oACAEBAAA/APn34W/s7wyW"
    "0U09v8nGAF5Y+g96+ovh1+z7bhoSdOhAGA6kb9pzjk5UD0x1r2vw78MNE8C+FY9c"
    "8S3+n+HtEtIk87VdTuEtreDzHCAvI7BVydoXnlmA5zXjPxc/b08H6B4E1LTvhR/p"
    "Xi6WyUafqU8AkitHkl+SVU5RsW6PKwkZXjklto5IWIuo7b//2Q=="
)
# 21x13 gray, q75, ragged edges
_A_G21 = _b64(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkS"
    "Ew8UHRofHh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/yQALCAAN"
    "ABUBAREA/8wABgAQEAX/2gAIAQEAAD8A/wCckHWjImGSggzTzvqQE8RfYVUtAEqo"
    "VOTkCeIeEntXp32vZIXRNP8AX353V8CbwYTiUWVQ5rndzIPhlTztRAgXm+c2DhWn"
    "RmFoRveBgpv40dauXatOka3siUI9eOA6bSf2MRIqZtrDCLeg9eT0GN+iRlm9va+r"
    "u2vMeb7xb7Siz7Yj00f00v2XLR5i/DHbKSb/2Q=="
)
_H_G21 = _b64(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAgGBgcGBQgHBwcJCQgKDBQNDAsLDBkS"
    "Ew8UHRofHh0aHBwgJC4nICIsIxwcKDcpLDAxNDQ0Hyc5PTgyPC4zNDL/wAALCAAN"
    "ABUBAREA/8QAHwAAAQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgED"
    "AwIEAwUFBAQAAAF9AQIDAAQRBRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2Jy"
    "ggkKFhcYGRolJicoKSo0NTY3ODk6Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1"
    "dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ipqrKztLW2t7i5usLDxMXGx8jJ"
    "ytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/9oACAEBAAA/AOO0TwkpRXeP"
    "j6da73SPCkeV/cJ7jGcfjxXZ2HhRPIwYcnj+6P5iqWi6NbmOPjoowcepxTPHeuS+"
    "EvDsjaZDGt5JZPPDO4yISJ7eL7vc/v8AdknGVGQQcV4w/irxLql7LqP9u3trLMCC"
    "trK8aqhkkdU4bJVTI4XJOAcDgV//2Q=="
)
# 32x24 RGB, q85, 4:2:0 interleaved MCUs
_A_C32 = _b64(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAUDBAQEAwUEBAQFBQUGBwwIBwcHBw8L"
    "CwkMEQ8SEhEPERETFhwXExQaFRERGCEYGh0dHx8fExciJCIeJBweHx7/2wBDAQUF"
    "BQcGBw4ICA4eFBEUHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4e"
    "Hh4eHh4eHh4eHh4eHh7/yQARCAAYACADASIAAhEBAxEB/8wACgAQEAUBEBEF/9oA"
    "DAMBAAIRAxEAPwD/AM1AFn1FfXD/AAZ6uZ7sUcQZgQx7d3AbROz1MRMBv7AyjBeg"
    "72ylr2dH67yYigwj5MLGKbIiZiW2cG8QP85P614PYjdw6HnUTCbCvyUd7Lopo0B+"
    "AR0ZhyZ3rTWC3hmHKvS9cRFaIDoMydNESNsKCoRvUotr7987FIwzOYtkMoZj5gh/"
    "/wBVYFXc1hcVfabA4jlpxWuZooFnIn+J0XVmTjnA3VbhNDenXKlivbkzOqnx5uzr"
    "Pt1pN3vB4akvOQ2/ZcG+gW3W9sqEtCGFCqCF9zbOkETEbz/NZKi7qJ4bXPiZSRyz"
    "s1IRb8uY0+lxjf7rSuLkAwjkkgAlWGIlTRzYrYpBltJV0aUY4hBVt1+vjQExpPdF"
    "roQKS3noG0VmNANKi5OfdWA31TwvE++3EHAjZqhshpWQGx+21L8vnU5Ksm+jEyLZ"
    "4yzkip9vCveGuWCk96aHCUD/2Q=="
)
_H_C32 = _b64(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAUDBAQEAwUEBAQFBQUGBwwIBwcHBw8L"
    "CwkMEQ8SEhEPERETFhwXExQaFRERGCEYGh0dHx8fExciJCIeJBweHx7/2wBDAQUF"
    "BQcGBw4ICA4eFBEUHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4e"
    "Hh4eHh4eHh4eHh4eHh7/wAARCAAYACADASIAAhEBAxEB/8QAHwAAAQUBAQEBAQEA"
    "AAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQAAAF9AQIDAAQRBRIh"
    "MUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3ODk6"
    "Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZ"
    "mqKjpKWmp6ipqrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx"
    "8vP09fb3+Pn6/8QAHwEAAwEBAQEBAQEBAQAAAAAAAAECAwQFBgcICQoL/8QAtREA"
    "AgECBAQDBAcFBAQAAQJ3AAECAxEEBSExBhJBUQdhcRMiMoEIFEKRobHBCSMzUvAV"
    "YnLRChYkNOEl8RcYGRomJygpKjU2Nzg5OkNERUZHSElKU1RVVldYWVpjZGVmZ2hp"
    "anN0dXZ3eHl6goOEhYaHiImKkpOUlZaXmJmaoqOkpaanqKmqsrO0tba3uLm6wsPE"
    "xcbHyMnK0tPU1dbX2Nna4uPk5ebn6Onq8vP09fb3+Pn6/9oADAMBAAIRAxEAPwDw"
    "jwb4f+58n6V7T4O0D7nyfpWP4R0y1VVYyx4GOhyfyFeq6fdaNoOiXOr6hKVtrSEy"
    "uQuCcdFGcAsxwAO5IHeuvPcDltOfs5V4JvZc0bu7stL9z4fGYyrVlyQTbei9TA+J"
    "ur/8Ix4XXTNNuvJ1rUMLH5b4kghyd0vQ4zjYDwcklTlTXBeDfD/3Pk/Sq0+u3Hiv"
    "xFca1eR3DPK5EELsCsEWTtjBHYA9cDJyTySa9K8HRfc/0L/x/wD+tWHJw7k+G9lO"
    "uud6u0ZPXtdRe3/B6n6jlGXTyjAqk178tZPTft6Lp831K/g7w/jZ8n6Vzvxe1p9Q"
    "1RfCOmSSLZ2b/wCnsjqUuJflITjnCHOQT97ORlAaKKwyTJMHXzCUqkb8iuvW6V/8"
    "j4jg6nHEZlKpUV3CN163Sv8AK+nnruP8HaB9z5P0r2nwb4f+58n6UUVOc5fQ1dj7"
    "bMcRU11P/9k="
)
# 17x11 RGB, q70, restart interval 2
_A_C17R = _b64(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAoHBwgHBgoICAgLCgoLDhgQDg0NDh0V"
    "FhEYIx8lJCIfIiEmKzcvJik0KSEiMEExNDk7Pj4+JS5ESUM8SDc9Pjv/2wBDAQoL"
    "Cw4NDhwQEBw7KCIoOzs7Ozs7Ozs7Ozs7Ozs7Ozs7Ozs7Ozs7Ozs7Ozs7Ozs7Ozs7"
    "Ozs7Ozs7Ozs7Ozs7Ozv/yQARCAALABEDASIAAhEBAxEB/8wACgAQEAUBEBEF/90A"
    "BAAC/9oADAMBAAIRAxEAPwD/AJqt6Jp6WUBEEC2tIaLKKhYNLiQt9BPLUsN5uh98"
    "QHaJ7OEXz0RuAWB8JTjiWg1a/9k="
)
_H_C17R = _b64(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAoHBwgHBgoICAgLCgoLDhgQDg0NDh0V"
    "FhEYIx8lJCIfIiEmKzcvJik0KSEiMEExNDk7Pj4+JS5ESUM8SDc9Pjv/2wBDAQoL"
    "Cw4NDhwQEBw7KCIoOzs7Ozs7Ozs7Ozs7Ozs7Ozs7Ozs7Ozs7Ozs7Ozs7Ozs7Ozs7"
    "Ozs7Ozs7Ozs7Ozs7Ozv/wAARCAALABEDASIAAhEBAxEB/8QAHwAAAQUBAQEBAQEA"
    "AAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQAAAF9AQIDAAQRBRIh"
    "MUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3ODk6"
    "Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZ"
    "mqKjpKWmp6ipqrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx"
    "8vP09fb3+Pn6/8QAHwEAAwEBAQEBAQEBAQAAAAAAAAECAwQFBgcICQoL/8QAtREA"
    "AgECBAQDBAcFBAQAAQJ3AAECAxEEBSExBhJBUQdhcRMiMoEIFEKRobHBCSMzUvAV"
    "YnLRChYkNOEl8RcYGRomJygpKjU2Nzg5OkNERUZHSElKU1RVVldYWVpjZGVmZ2hp"
    "anN0dXZ3eHl6goOEhYaHiImKkpOUlZaXmJmaoqOkpaanqKmqsrO0tba3uLm6wsPE"
    "xcbHyMnK0tPU1dbX2Nna4uPk5ebn6Onq8vP09fb3+Pn6/90ABAAC/9oADAMBAAIR"
    "AxEAPwDhNJ037vy12mlab935azdKjT5flFdppMafL8orrxeBgeFiK7Iv7M/2aK6L"
    "Yv8AdFFeP9SpnB7eR//Z"
)
# 32x24 RGB, q60, DAC conditioning L=2 U=4 Kx=12 (non-default)
_A_C32COND = _b64(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAA0JCgsKCA0LCgsODg0PEyAVExISEycc"
    "HhcgLikxMC4pLSwzOko+MzZGNywtQFdBRkxOUlNSMj5aYVpQYEpRUk//2wBDAQ4O"
    "DhMREyYVFSZPNS01T09PT09PT09PT09PT09PT09PT09PT09PT09PT09PT09PT09P"
    "T09PT09PT09PT09PT0//yQARCAAYACADASIAAhEBAxEB/8wACgBCEAwBQhEM/9oA"
    "DAMBAAIRAxEAPwD/AHLJDKctvDxWoFcGOAgtWttKanJ3gUKLe1kMk4uKUPlvpQxD"
    "Pe7LBuYA8t2ZDtKV7WGYyyZTqTuBHsmTSBKU9wox+kXc1Z/TbD3pg4Jg0Gxi3trK"
    "7/PWJKw0NCDCys+at/FDUnuODgk1JApuQ3AvV+315gZBYlJsIHq0x5rpNcajRmzI"
    "ELoUaTPJPwtbG8JJz0qri8VXiYwt6KHEBShagzfwdxtuCnmprvTkcJbVjS6yHp88"
    "p2a5E4Dmn9gjQRQpeKj/2Q=="
)
_H_C32COND = _b64(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAA0JCgsKCA0LCgsODg0PEyAVExISEycc"
    "HhcgLikxMC4pLSwzOko+MzZGNywtQFdBRkxOUlNSMj5aYVpQYEpRUk//2wBDAQ4O"
    "DhMREyYVFSZPNS01T09PT09PT09PT09PT09PT09PT09PT09PT09PT09PT09PT09P"
    "T09PT09PT09PT09PT0//wAARCAAYACADASIAAhEBAxEB/8QAHwAAAQUBAQEBAQEA"
    "AAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgEDAwIEAwUFBAQAAAF9AQIDAAQRBRIh"
    "MUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2JyggkKFhcYGRolJicoKSo0NTY3ODk6"
    "Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1dnd4eXqDhIWGh4iJipKTlJWWl5iZ"
    "mqKjpKWmp6ipqrKztLW2t7i5usLDxMXGx8jJytLT1NXW19jZ2uHi4+Tl5ufo6erx"
    "8vP09fb3+Pn6/8QAHwEAAwEBAQEBAQEBAQAAAAAAAAECAwQFBgcICQoL/8QAtREA"
    "AgECBAQDBAcFBAQAAQJ3AAECAxEEBSExBhJBUQdhcRMiMoEIFEKRobHBCSMzUvAV"
    "YnLRChYkNOEl8RcYGRomJygpKjU2Nzg5OkNERUZHSElKU1RVVldYWVpjZGVmZ2hp"
    "anN0dXZ3eHl6goOEhYaHiImKkpOUlZaXmJmaoqOkpaanqKmqsrO0tba3uLm6wsPE"
    "xcbHyMnK0tPU1dbX2Nna4uPk5ebn6Onq8vP09fb3+Pn6/9oADAMBAAIRAxEAPwDk"
    "dOsunFdRp9l04qvYW8YAO5fwroIpLaztXuJmxHGpY8dfYZ7ntWmKpUE+VyX3o8up"
    "UlJ2SKetXP2CwEEEm26m4G0/Mi92/p268dKyNOsunFRtdvqN69zKrksfkUnhF7KP"
    "pW7p69P3X61FsHhocrlq99G/0Pdw9F4ely9XuM0+y6cVR1+6M9wNOtyRHEf3pBGH"
    "bjj8P59uKKKnC4WnKs21seXlqU67cuiuO0+y6cV1GnWXTiiiliaMD1K02f/Z"
)
# 48x40 gray, q50, restart interval 3
_A_G48R = _b64(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDABALDA4MChAODQ4SERATGCgaGBYWGDEj"
    "JR0oOjM9PDkzODdASFxOQERXRTc4UG1RV19iZ2hnPk1xeXBkeFxlZ2P/yQALCAAo"
    "ADABAREA/8wABgAQEAX/3QAEAAP/2gAIAQEAAD8A/buQ/e2blRD97JVDDxt/eJum"
    "incGg2jBQzjf/RM0O6tAFbRxiXHSP5Ii3LTmPwTJF6HH7rgvUleKvlK/q2A9Fzyq"
    "t1Y7n7ql84CWmfe5VXQfGrBU5x4QzODYoP/QnmnZgZWl0HWNAxhW501x8gRAcf7P"
    "X+3KyZkN6OBz5kohujumUM4MuNfSeiJQzxv7JhA+9WJ1gaqjfvfuYnBx8ATBs9Nk"
    "g7I0WMUkzSJTCGYkoyqB3CwxmvyYJP/RhDNkL2o5hpv7i6lvq+MFOJCOQzSka2xn"
    "Dieg1fg79mUZUqNsGtdA5PdFufMhc2gobP2zUUgvCX1dmiAhNZrM1V1c+cl/aD1F"
    "GCOv6N5lz1X09sIy7iRQ/9LAk2nf5sRF7qvrPkPkoNbGHHvyvXhEqGN/QIN0V6dg"
    "mTw01oUl5QQm/kwjX1y/QIopgN2iEmjHkbzTlVkxds5hXwwoJo1GPK9s94TerNRw"
    "tkLoev/TohjIINknNU6VDIs5mMgVctY/NQoA8CDVGRG5/GAzzlp6OtgtwCBJCEQ9"
    "j8lOcDgDZFjzTE6UVZImeBtwhuqZJEugTo5BTfj3tFvIhh9w5LIZ1g9Ce17A4P/U"
    "y5tXxo0uPitjWclPSLO2+mk7Q+vT3RWG5jb1Z5RBfnnPup5p8/8AB/xWIzspOtrM"
    "gSoPOEwsjtPoYRkAj1fTIvtV/UXrMWu4K9r2MBcmfT6OcEkOvBOYK2it/9XvGCQZ"
    "7/ju4ri0qFx/8/oedkSS4ftHippSr3V+esm+ErBgj+9K00+NBdlFFJdjBZAXJ52w"
    "hoKCOowNwDxoSSeYU4S36yCRb8Qrh5gv289lnjo8/iqfq0T/1ptH+F7JEdQfCTvs"
    "NZUsAt945coH3LrmsYRtasBlKC6yWtwTLaKo/j8RE26Xhnkbz3QGX/E7pCZlrivC"
    "9DrhzEe5kBhpT/3WtMElDRbAcbcQsFwLlJ2gg3Lu7oO//9ft+1E2rT/55+w8SYWW"
    "HOCCbVTFOs+KB0opZ1oFawvus6bK9Z/pfkopUBKzhoBxEDTXmjOVaa/PsaUOodSo"
    "CCChUHYqop9pMbqG2P6vka6rWP7zUtYFRh5s/9DLcnXtM1dWWK8keZybtmWqfP6t"
    "lbroJpUZGnNs95T88KEw91hyjgqK+99ouqZ0oSXSJ2kYNtNg8npiw4Lm02domTIi"
    "YGO948nnskcyOmfNXmD/2Q=="
)
_H_G48R = _b64(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDABALDA4MChAODQ4SERATGCgaGBYWGDEj"
    "JR0oOjM9PDkzODdASFxOQERXRTc4UG1RV19iZ2hnPk1xeXBkeFxlZ2P/wAALCAAo"
    "ADABAREA/8QAHwAAAQUBAQEBAQEAAAAAAAAAAAECAwQFBgcICQoL/8QAtRAAAgED"
    "AwIEAwUFBAQAAAF9AQIDAAQRBRIhMUEGE1FhByJxFDKBkaEII0KxwRVS0fAkM2Jy"
    "ggkKFhcYGRolJicoKSo0NTY3ODk6Q0RFRkdISUpTVFVWV1hZWmNkZWZnaGlqc3R1"
    "dnd4eXqDhIWGh4iJipKTlJWWl5iZmqKjpKWmp6ipqrKztLW2t7i5usLDxMXGx8jJ"
    "ytLT1NXW19jZ2uHi4+Tl5ufo6erx8vP09fb3+Pn6/90ABAAD/9oACAEBAAA/AKun"
    "6RDpM+bl98qsoMERDSc8/dzxxzk4/UVaTzoi807bysvmXWH2qX/hjDE9F5JHOAo/"
    "ukU2ONY444UXzItiqoZVDBdpGANwPO5yM85eP1xX/9ATzhbvLI6MWTLCX5QytyQS"
    "QNm7AdcDGdw56FqhVkgRVk+0W/ywGIKswwB8pjON2BkEgkEDHPJqxJLeQxrLPeXP"
    "lSL+8K20cZizgYLELg84ypPPfpX/0SaFo0dUG6FsMQAqoNzbSpK8EYPRn/A8ZEiX"
    "cjRM3mGMoN2UZjjhSu3jKknbjHJPznio0SFrd4Ps9xLO/PmED7/GMHJ4+Y8c5zzu"
    "LrX/0nNlXicr55jwMDJKnJ3FeSOpCknC8nJfGaLeILEWRWuIlVl+XaqZLk5UvhT0"
    "OdqAj19W/wCqhL/ZmgQkh5PLil2rg5P7vBX/AHs8V//TI4EhhjWT7P8AZ5iYkngj"
    "CEEjOHj6MDgjHPAPTNGVkQ5i8uQoysiOuYyjDzAMjGADuXrhgcccFyxuqCF40ZFZ"
    "U2wMx2fMRuUEYG0iZunGQe3H/9SQS5nVJtjI0Ju3jC/Ky8CNO3ADA45Gcjoabptk"
    "l9afbb795DJlILeNiioqnGTjHpgAcAfo3U7JNMW1vdP8yENKIni3FgcgkNknI6Y/"
    "Lp3/AP/VatuVhg04uPOWRZpiygiJAD1J+6eQeO2c8HkWL598fyGRpSfNHCrKc4bB"
    "+UhFZueOnXNSPJISxVBEwKvsEhyzFiwTeBgZ3SIR6r74P//WIiTdw4DTbY2jG0D9"
    "/D/s8cMuBleD8vX72HWMk9uwjs7+JYEO4214u0AsOmTg8Hn5TjP15bHvuRHdT3DX"
    "ksa7Y2lj8mKIkjlsheue3JwBkcV//9doCwRPDGqRQqyKUUKu0kgqSGwTwf4tq5Cn"
    "ByMxyFYIFMYExY55BbadwJHIzu3YySMk44xtVnW+xrPDQxLkhVUAAMMAEe42gHk4"
    "wAdw4Zv/0JHRCnA81Dh9gzJ5ibsFiuMtwF+bCHnqc5qrcQ3SziOOTYiYVVWbAUDo"
    "APOqxIJI5VLYEyx4Dspd3GQSFyTnAOflcEEnvgV//9k="
)

PAIRS = {
    "g16_gray_q90": (_A_G16, _H_G16),
    "g21_gray_ragged": (_A_G21, _H_G21),
    "c32_rgb_420": (_A_C32, _H_C32),
    "c17r_rgb_restart": (_A_C17R, _H_C17R),
    "c32_custom_dac_conditioning": (_A_C32COND, _H_C32COND),
    "g48r_gray_q50_restart3": (_A_G48R, _H_G48R),
}


def test_qm_state_table_is_wellformed():
    """113 adaptive states + the fixed 0.5 state; spot values per ITU-T
    T.81 Table D.3 (cross-checked against libjpeg's jpeg_aritab)."""
    assert len(_QM_TAB) == 114
    assert _QM_TAB[0] == (0x5A1D, 1, 1, 1)
    assert _QM_TAB[1][0] == 0x2586 and _QM_TAB[2][0] == 0x1114
    assert _QM_TAB[14] == (0x5A7F, 15, 15, 1)
    assert _QM_TAB[113] == (0x5A1D, 113, 113, 0)  # fixed, non-adapting
    for qe, nlps, nmps, sw in _QM_TAB:
        assert 0 < qe < 0x8000
        assert 0 <= nlps < 114 and 0 <= nmps < 114
        assert sw in (0, 1)


def test_arith_decodes_bit_equal_to_huffman_twin():
    """Every SOF9 fixture must produce the exact DC-scale result of its
    Huffman twin: same dims, same thumbnail bytes, same mean."""
    for name, (arith, huff) in PAIRS.items():
        ra = _decode_image_jpeg_dc_arith(arith)
        rh = _decode_image_jpeg_dc(huff)
        assert ra == rh, name


def test_decode_image_routes_sof9_without_pillow():
    """decode_image must reach the arithmetic decoder for SOF9 payloads
    on the no-dependency path (Pillow cannot decode these at all)."""
    for name, (arith, huff) in PAIRS.items():
        assert decode_image(arith, use_pil=False) == decode_image(
            huff, use_pil=False
        ), name


def test_huffman_decoder_signals_sof9():
    try:
        _decode_image_jpeg_dc(_A_G16)
    except _ArithmeticJpegError:
        pass
    else:
        raise AssertionError("SOF9 must raise the arithmetic routing signal")


def test_truncated_arith_degrades_to_seam():
    """A truncated SOF9 stream must degrade to the Pillow-seam error,
    never crash the Arrow batch with an internal exception."""
    try:
        decode_image(_A_C32[:80], use_pil=False)
    except ValueError as exc:
        assert "pillow" in str(exc).lower() or "PNM" in str(exc)
    else:
        raise AssertionError("truncated stream decoded?!")


def test_arith_through_arrow_decode_images(spark):
    """The Arrow decode_images path must decode SOF9 blobs and agree
    with the Huffman twin, per row (even doc_id = arithmetic, odd = its
    Huffman twin)."""
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.multimodal import (
        decode_images,
    )

    names = sorted(PAIRS)
    rows = []
    for i, name in enumerate(names):
        arith, huff = PAIRS[name]
        rows.append((2 * i, bytearray(arith)))
        rows.append((2 * i + 1, bytearray(huff)))
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    out = {
        r["doc_id"]: (r["width"], r["height"], r["n_pixels"], bytes(r["thumbnail"]))
        for r in decode_images(df, "blob", decoder=decode_image).collect()
    }
    assert len(out) == 2 * len(names)
    for i, name in enumerate(names):
        assert out[2 * i] == out[2 * i + 1], name



# --- progressive arithmetic (SOF10) --------------------------------------------------
# Twins here are PROGRESSIVE HUFFMAN (SOF2) encodings of the same image at
# the same quality: identical quantized DC planes, decoded by the
# independently-validated progressive-Huffman DC decoder.

# 16x16 gray, q90, progressive (SOF10 vs SOF2 twin)
_A_G16P = _b64(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAMCAgMCAgMDAwMEAwMEBQgFBQQEBQoH"
    "BwYIDAoMDAsKCwsNDhIQDQ4RDgsLEBYQERMUFRUVDA8XGBYUGBIUFRT/ygALCAAQ"
    "ABABAREA/8wABAAQ/9oACAEBAAAAAf8AqP8AqgN0gP/MAAQQBf/aAAgBAQABBQIW"
    "JCvxdFBVZhzOCvv3fGfJl9pRn//MAAQQBf/aAAgBAQAGPwIONzAn2c9rCwALlJYy"
    "tJ5fx6Dwa4Z5XCnnarFkHfeQy3GzVELtEod2VNzcRkD/zAAEEAX/2gAIAQEAAT8h"
    "vo9i3R/upCJSazJZgZhMW7BtAHhsMgImNEKjpuwqH1KA/9oACAEBAAAAEKD/zAAE"
    "EAX/2gAIAQEAAT8QXi9WNPwoyLSQSUJRoyI3JC1//MoTDdEWvPHqAArMexg6LBDD"
    "H+W0/9k="
)
_H_G16P = _b64(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAMCAgMCAgMDAwMEAwMEBQgFBQQEBQoH"
    "BwYIDAoMDAsKCwsNDhIQDQ4RDgsLEBYQERMUFRUVDA8XGBYUGBIUFRT/wgALCAAQ"
    "ABABAREA/8QAFQABAQAAAAAAAAAAAAAAAAAABgf/2gAIAQEAAAABn1RajP/EABoQ"
    "AAIDAQEAAAAAAAAAAAAAAAQFAQIGAwD/2gAIAQEAAQUCV52Jquz9fDrOIIrfeh8A"
    "f//EACIQAAECBQQDAAAAAAAAAAAAAAECAwAEESEjBRIiMTJhkv/aAAgBAQAGPwIE"
    "pgYxAfmVty7KRd1xW1Ir7hxvSuU2UY3CKhNT383v0SkEeQT/AP/EAB0QAAICAQUA"
    "AAAAAAAAAAAAAAERACExQWFxgbH/2gAIAQEAAT8hqjcZjXdGV5B8TKmSsihotzKH"
    "ctzQAwaEmBIGT//aAAgBAQAAABA//8QAGxABAAMAAwEAAAAAAAAAAAAAAQARITFB"
    "UWH/2gAIAQEAAT8Q6DWg0vD7CIkFDG11rYPK5mMN9tSlWNNaBtzBswfbu1DkTAh/"
    "/9k="
)
# 32x24 RGB, q85, progressive 4:2:0
_A_C32P = _b64(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAUDBAQEAwUEBAQFBQUGBwwIBwcHBw8L"
    "CwkMEQ8SEhEPERETFhwXExQaFRERGCEYGh0dHx8fExciJCIeJBweHx7/2wBDAQUF"
    "BQcGBw4ICA4eFBEUHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4e"
    "Hh4eHh4eHh4eHh4eHh7/ygARCAAYACADASIAAhEBAxEB/8wABgAQARD/2gAMAwEA"
    "AhADEAAAAf8AmYdnjjPOkLy0iOLfXfis1ahkFKYeFpQ6/8wABBAF/9oACAEBAAEF"
    "AhWd2jRjxPKkj5j00byn1mheN5lXoSrBUqvYLrReANLe/8wABBEF/9oACAEDAQE/"
    "ATVGnF3sXvBO1AnkiCQOhjQHHD8FC9TA/8wABBEF/9oACAECAQE/ATpdO6Gx7pp/"
    "B7TmK4oHiRg3Dh4P5QHpWLuzxmDcfYj/zAAEEAX/2gAIAQEABj8C7MGZhk2rHdhr"
    "jdIHDhC0nEWzNgg6NiHke5X33ly4yJ9IEP/MAAQQBf/aAAgBAQABPyGoFhXzYAEO"
    "jP2HLafZ+4/Ts4v0lYhuWgioPX5kAyCi4q24u5WDLvBrilD/2gAMAwEAAgADAAAA"
    "ELeIYP/MAAQRBf/aAAgBAwEBPxCUKSaQWo8PggEV9TGMr4MCaDIrHmFh56aFav/M"
    "AAQRBf/aAAgBAgEBPxCsNOXJLtw7cT24JmoX9mYe4nIdhRbV0P4s2Yapy1Wm/8wA"
    "BBAF/9oACAEBAAE/EFIcIDzhxVKjwfqU46qHN1FQrTyNDZUSTyoTxofkxlaqIxZO"
    "wYcqI+muiNDGfLK8EQMzt5Dti02fpm4z0zlTYvZIchaaYvQa42+c/9k="
)
_H_C32P = _b64(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDAAUDBAQEAwUEBAQFBQUGBwwIBwcHBw8L"
    "CwkMEQ8SEhEPERETFhwXExQaFRERGCEYGh0dHx8fExciJCIeJBweHx7/2wBDAQUF"
    "BQcGBw4ICA4eFBEUHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4eHh4e"
    "Hh4eHh4eHh4eHh4eHh7/wgARCAAYACADASIAAhEBAxEB/8QAGQAAAgMBAAAAAAAA"
    "AAAAAAAAAAYDBAUB/8QAGAEAAgMAAAAAAAAAAAAAAAAAAwUBAgb/2gAMAwEAAhAD"
    "EAAAAUN1ptRUdDAjZaaiPOAaTrqEO//EABsQAAMAAwEBAAAAAAAAAAAAAAADBAEC"
    "BRMU/9oACAEBAAEFAo5yNB02/NLHOSL1F7JQnL9qqI8Ec513ejY0Ec5//8QAHREA"
    "AQQCAwAAAAAAAAAAAAAAAQACAwQFQRESMf/aAAgBAwEBPwGaZzjwFUrmpB12fVh2"
    "iSyXO0FYkcv/xAAgEQACAgEDBQAAAAAAAAAAAAABBAACAwUREiExcZHR/9oACAEC"
    "AQE/AXsC1TxNx7E205PHxN+vg/IklhuwTYdo4vSf/8QAIhAAAQIFBAMAAAAAAAAA"
    "AAAAAQIDABARMVESExQyISJi/9oACAEBAAY/ApbbaqPOWpcDMriFOuH1SKwp5YV5"
    "sMDEdJcRsnQjv9Gf/8QAHxAAAgIBBAMAAAAAAAAAAAAAAAEhMRFBcbHBYYGh/9oA"
    "CAEBAAE/IaoKYMNX2Ty+nFFUC6TDC0y0fN2OaG07jSFHYogehYyaaxBHrnYpgqg/"
    "/9oADAMBAAIAAwAAABCZEKL/xAAdEQABBAMBAQAAAAAAAAAAAAABABEhQTFxgVFh"
    "/9oACAEDAQE/EGNkkwNoeMXFGfNCum0IBy8NuA/Hj7OVMlf/xAAdEQACAgIDAQAA"
    "AAAAAAAAAAABEQAhMVFBcdHh/9oACAECAQE/EFEycCwsoU9yp72US9MFj7zHoFY7"
    "YD8l0qf/xAAdEAEBAAIDAQEBAAAAAAAAAAABEQAhMUHx0ZHw/9oACAEBAAE/EPDz"
    "z845BoanpZZLpqqqzw8UEicNfwxLqzkLOBYKQDtQ7x0BwprYJ0DzCtXauf3/AJkv"
    "nmyEG26Ndx2i9qUuefnh5//Z"
)
# 48x40 gray, q50, progressive + restart interval 2
_A_G48P = _b64(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDABALDA4MChAODQ4SERATGCgaGBYWGDEj"
    "JR0oOjM9PDkzODdASFxOQERXRTc4UG1RV19iZ2hnPk1xeXBkeFxlZ2P/ygALCAAo"
    "ADABAREA/8wABAAQ/90ABAAC/9oACAEBAAAAAfqI/9Dg/9Hj/9KA/9PxwP/UuP/V"
    "gP/Wsv/XuP/Q2P/RuP/SuP/T6P/U8eD/1faw/8wABBAF/9oACAEBAAEFAhrpnTi3"
    "/9AQ6yCvQP/RUgqbr4D/0id2EP/TbvD/1B5h9Mj/1RDrHYD/1pW4/9ca4hMbKoD/"
    "0KTAoP/RfCWGQP/SF34uaYD/013NkP/UHXn/1UszDDDg/8wABBAF/9oACAEBAAY/"
    "Amzn8pq15fi2Y51g/9AQr0n3AAAACXKdCP/RCOzsFTNPw37hNPj2q7s4/9JOGuJA"
    "/9OSKcH6CD0tQP/UT/ttltUfmFYw/9ULLduzGCG5Be+yieX3EP/WkXh+5XABpsuC"
    "Kk8g/9eITrtL5z8+o70wEoD/0BLQKxdhMAVu4Sqo/9FP/wCJDoANPsOQscD/0pSN"
    "MmGpT+pKaAe0jgyg/9OTpy4E/9Rd1XFa+//Vk8IrNDo05wL/zAAEEAX/2gAIAQEA"
    "AT8hGX2qtNyho/I+IKmYb2R4/9CSF4hQwNemNp7Sxn5egCR9qZn0Pv/R6MMij2oU"
    "yVXP8ZDPs0D/0u67vhdxdNwY5xV3968zt6+SlqWB9ED/0/2gyphodC0OjCNyy09n"
    "3oMIkP/Ub6g5D559ai5Dqmx2CMXVgZbVwP/VHPaCOM7R4rR8WmEjTbxWoP/W46FA"
    "/wBizm0zeTtLYxQdvPzo/9fQgPYR0tNBw+js/9Ddmg9A7uzB9VBTOVeFYP/Rp6C3"
    "qGtDJo0h6clbfNzEj6AtZVz/0sJPCJz0v0BZsAO06bWA/9Oeevp4LdmFgn7joyp1"
    "Yy6epvJt7Z6g/9SbFEc+8GdEOVy135qpJBiJ5tiBgP/VG/zboArJS6hr2uf3CEr/"
    "2gAIAQEAAAAQgP/QgP/RgP/SgP/TgP/UgP/VgP/WgP/XgP/QgP/RgP/SgP/TgP/U"
    "gP/VgP/MAAQQBf/aAAgBAQABPxAt/XoNLSW8c/Pv36aLl6jzJZXVavwTgP/QTUsp"
    "ABNBFmY3EriKNtg7BR96VOIFwP/RDGo3MIeNtuUZNJ/do6t6g6qu7S0kUw8+v//S"
    "XySa/WZjbBk6dv6Nc/fyC4ll8lfgF0D/09dTDXwp/ClTNMxPr0CAmzvmhbZbHD9p"
    "/9QX3RvglmH6fGkE4CS8zyHYEoLrdiz/1Qg3+Kt9Dm4oPlayJPv9gqrijPvkRrVk"
    "X4D/1o14MhQYbWiixsTpSd9mbq54r78dhD5tOP/XBWM+qZBjfuilc47ZpVi7OSxF"
    "EgIXSUnw/9B+EPv1gfKxwBvsuwD/AHIuMUIhDfr5boHugP/RtGdll9OU7z5Ud9dP"
    "Vgw553N2WddOMf/SgeJS2c/lA3RYp7EoSOCyMbtZ355AGugw/9P5u1PaSsEl1I1X"
    "UlrloBSRpnNxJooueipO/9R9QoGQhSKmxILgSMuQoTcbD/vF9/NH5s3/1V+l5Bcl"
    "NXgYr1yIpZdJqnxezNBm/9k="
)
_H_G48P = _b64(
    "/9j/4AAQSkZJRgABAQAAAQABAAD/2wBDABALDA4MChAODQ4SERATGCgaGBYWGDEj"
    "JR0oOjM9PDkzODdASFxOQERXRTc4UG1RV19iZ2hnPk1xeXBkeFxlZ2P/wgALCAAo"
    "ADABAREA/8QAFwABAAMAAAAAAAAAAAAAAAAAAQACA//dAAQAAv/aAAgBAQAAAAHL"
    "X//QH//RNP/Sk//Trf8A/9RP/9WT/9Zf/9dP/9An/9FP/9JP/9Mr/9Sun//Vpp//"
    "xAAfEAABBAICAwAAAAAAAAAAAAABAAIRIQMSMTITIkH/2gAIAQEAAQUCx4hiNhf/"
    "0AIF6//R+kvA/9IiFC//061X/9Rorgf/1QIHK//WhTf/18bN25GeNf/Q1qF//9GS"
    "h2//0mEtQ9l//9PgGh//1G9F/9VwdJkH/8QAKhAAAQIDBQcFAAAAAAAAAAAAAQAR"
    "AiExEkFRYfADIlJxkaGxMoHB0eH/2gAIAQEABj8C3q4Cqc4vF9L/0AKjWuic91//"
    "0RW1DRq9E5jiY13QGX//0slKrL//02sxE4oXsv/U4gvS2bA+F//VD2bJk4HwqMfG"
    "K//WZumuanhabwv/17ccwaQhQx7NxNmX/9AbO93OSle9c1//0cPfWaF8m5hf/9Jo"
    "Iw3DGhEYrZFHDAL/02EgpTX/1KBY93X/1WB7/qzZf//EACQQAQABAwIGAwEAAAAA"
    "AAAAAAERACExQVFhcYGRscGh8PHh/9oACAEBAAE/IbvSE1uyi88xkwTpLh64V//Q"
    "AEsASExHPi96F5BkvhI+Jyda/9EgEMC0cu6gUIYdwt8V/9Jwhd30C7EW9tAkU4L2"
    "XhEbaea//9MGpj8vr+yU2VHq3jxtzr//1IJAgJaAzpNuxWrI62A8Odf/1RNoKN31"
    "VYbBEEwf0ca//9YQTCCENtfJyvrCRRnhZNHzX//XLbUyACiN4ySnrX//0CE60TmH"
    "qi6bJcg3bWFr/9FuQSsxqZmJ6jpXFxVnx8Tbhzr/0moI3gjP3SpSYELqTFf/07MQ"
    "KEEEbZ9wYqB6vWL+Z+4H/9SDcWgb/T91UI2ZjQnMa6XtX//VHaAsBjWAnHJJXl/G"
    "v//aAAgBAQAAABA//9A//9E//9I//9M//9Q//9U//9Y//9c//9A//9E//9I//9M/"
    "/9Q//9U//8QAHxABAQEBAAMAAwEBAAAAAAAAAREhMQBBUWGBoXGR/9oACAEBAAE/"
    "EKmeFzTfbM2s/p5ba4lnqJ5pTYD6PP/QwBMAFCBDtS7ftPJLaoy0IqHIkSxvH//R"
    "HRgSCBpTBRRRCbr51DYUuEUQ7KnffPP/0gNwIAOhOEjz9Ll3KEdMmLhUuJq7zz//"
    "0+4z0HzI1zWbbteVL1ghVVa0nUSzTWb5/9QV9ogK2qVxsU+/e12pyY14f2Z5/9XW"
    "AJ5ilnIMSbg8vlTbLHIoKSA+yBmY/wD/1gtVFOxBIUcMo+sLtUN6A9OAGaWnHz//"
    "1/bYOGkrJ8gGB/J5A3g0Upacn/Oe/wD/0ETNABDHq9aOercd+upZxNkOjYznb5//"
    "0WKEmNVEJkLSffyi1kQCD+TIFw/Xp//SCJupAjlY47qX/dj0iCam0dX1rApnn//T"
    "BcYioUUkLj+QKNKlgJXRpCml4VSrMng//9TEpIAAEBPyQOsgMZ4PyXk7wlRcHB71"
    "t8//1QODwADgHgJQQDD0UpbBuKK+4ef/2Q=="
)

PROG_PAIRS = {
    "g16p_gray_q90": (_A_G16P, _H_G16P),
    "c32p_rgb_420": (_A_C32P, _H_C32P),
    "g48p_gray_q50_restart2": (_A_G48P, _H_G48P),
}


def test_progressive_arith_decodes_bit_equal_to_huffman_twin():
    from harvard_artifacts_collection_data_engineering_analytics_app_spark.operators.multimodal import (
        _decode_image_jpeg_dc_progressive,
        _decode_image_jpeg_dc_progressive_arith,
    )

    for name, (arith, huff) in PROG_PAIRS.items():
        ra = _decode_image_jpeg_dc_progressive_arith(arith)
        rh = _decode_image_jpeg_dc_progressive(huff)
        assert ra == rh, name


def test_progressive_arith_equals_sequential_encoding_of_same_image():
    """SOF10 and SOF9 encodings of the same image at the same quality
    carry the same quantized DC plane (the refinement scans restore the
    successive-approximation bits exactly), so the two arithmetic
    decoders must agree with each other too."""
    for prog, seq in (("g16p_gray_q90", "g16_gray_q90"),
                      ("c32p_rgb_420", "c32_rgb_420")):
        rp = decode_image(PROG_PAIRS[prog][0], use_pil=False)
        rs = decode_image(PAIRS[seq][0], use_pil=False)
        assert rp == rs, (prog, seq)


def test_decode_image_routes_sof10_without_pillow():
    for name, (arith, huff) in PROG_PAIRS.items():
        assert decode_image(arith, use_pil=False) == decode_image(
            huff, use_pil=False
        ), name

"""Numeric constants shared by all kernels.

Values mirror the reference's proj.h / proj_internal.h definitions
(/root/reference/src/proj_internal.h) so conformance tests agree bit-for-bit.
"""

import math

M_PI = math.pi
M_TWOPI = 2.0 * math.pi
M_HALFPI = 0.5 * math.pi
M_FORTPI = 0.25 * math.pi
M_PI_HALFPI = 1.5 * math.pi
M_TWOPI_HALFPI = 2.5 * math.pi

DEG_TO_RAD = 0.017453292519943296
RAD_TO_DEG = 57.295779513082321

# Slack allowed on |lat| - pi/2 before declaring over-range (fwd_prepare).
EPS_LAT = 1e-12

HUGE_VAL = math.inf

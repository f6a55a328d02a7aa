"""In-band error codes.

The reference signals per-point errors by setting coordinate lanes to
HUGE_VAL plus an errno (PJD_ERR_* codes, /root/reference/src/proj_internal.h:612-673).
Our engine carries an ``err:int32`` column; 0 = OK, first error wins.
"""

ERR_NO_ARGS = -1
ERR_PROJ_NOT_NAMED = -4
ERR_UNKNOWN_PROJECTION_ID = -5
ERR_INVALID_ECCENTRICITY = -6
ERR_UNKNOWN_UNIT_ID = -7
ERR_INVALID_BOOLEAN_PARAM = -8
ERR_UNKNOWN_ELLP_PARAM = -9
ERR_REV_FLATTENING_IS_ZERO = -10
ERR_ES_LESS_THAN_ZERO = -12
ERR_MAJOR_AXIS_NOT_GIVEN = -13
ERR_LAT_OR_LON_EXCEED_LIMIT = -14
ERR_INVALID_X_OR_Y = -15
ERR_WRONG_FORMAT_DMS_VALUE = -16
ERR_NON_CONV_INV_MERI_DIST = -17
ERR_NON_CON_INV_PHI2 = -18
ERR_ACOS_ASIN_ARG_TOO_LARGE = -19
ERR_TOLERANCE_CONDITION = -20
ERR_CONIC_LAT_EQUAL = -21
ERR_LAT_LARGER_THAN_90 = -22
ERR_LAT1_IS_ZERO = -23
ERR_LAT_TS_LARGER_THAN_90 = -24
ERR_CONTROL_POINT_NO_DIST = -25
ERR_NO_ROTATION_PROJ = -26
ERR_W_OR_M_ZERO_OR_LESS = -27
ERR_LSAT_NOT_IN_RANGE = -28
ERR_PATH_NOT_IN_RANGE = -29
ERR_INVALID_H = -30
ERR_K_LESS_THAN_ZERO = -31
ERR_LAT_1_OR_2_ZERO_OR_90 = -32
ERR_LAT_0_OR_ALPHA_EQ_90 = -33
ERR_ELLIPSOID_USE_REQUIRED = -34
ERR_INVALID_UTM_ZONE = -35
ERR_FAILED_TO_FIND_PROJ = -37
ERR_FAILED_TO_LOAD_GRID = -38
ERR_INVALID_M_OR_N = -39
ERR_N_OUT_OF_RANGE = -40
ERR_LAT_1_2_UNSPECIFIED = -41
ERR_ABS_LAT1_EQ_ABS_LAT2 = -42
ERR_LAT_0_HALF_PI_FROM_MEAN = -43
ERR_GEOCENTRIC = -45
ERR_UNKNOWN_PRIME_MERIDIAN = -46
ERR_AXIS = -47
ERR_GRID_AREA = -48
ERR_INVALID_SWEEP_AXIS = -49
ERR_MALFORMED_PIPELINE = -50
ERR_UNIT_FACTOR_LESS_THAN_0 = -51
ERR_INVALID_SCALE = -52
ERR_NON_CONVERGENT = -53
ERR_MISSING_ARGS = -54
ERR_LAT_0_IS_ZERO = -55
ERR_ELLIPSOIDAL_UNSUPPORTED = -56
ERR_INVALID_ARG = -58
ERR_INCONSISTENT_UNIT = -59
ERR_MUTUALLY_EXCLUSIVE_ARGS = -60
ERR_GENERIC_ERROR = -61

# positive system errno used by the dispatchers when an operation has no
# kernel for the requested direction (fwd.cpp:189 / inv.cpp:166
# proj_errno_set(P, EINVAL) before returning proj_coord_error)
EINVAL = 22


class ProjError(Exception):
    """Raised at *plan time* (operation construction). Runtime per-point
    errors never raise — they flow through the err column."""

    def __init__(self, code: int, message: str = ""):
        self.code = code
        super().__init__(f"proj error {code}: {message}")

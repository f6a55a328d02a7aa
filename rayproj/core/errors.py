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

# pj_err_list (strerrno.cpp:11-77): message for code -(index+1).
ERR_LIST = (
    "no arguments in initialization list",                  # -1
    "no options found in 'init' file",                      # -2
    "no colon in init= string",                             # -3
    "projection not named",                                 # -4
    "unknown projection id",                                # -5
    "effective eccentricity < 0 or >= 1.",                  # -6
    "unknown unit conversion id",                           # -7
    "invalid boolean param argument",                       # -8
    "unknown elliptical parameter name",                    # -9
    "reciprocal flattening (1/f) = 0",                      # -10
    "|radius reference latitude| > 90",                     # -11
    "squared eccentricity < 0",                             # -12
    "major axis or radius = 0 or not given",                # -13
    "latitude or longitude exceeded limits",                # -14
    "invalid x or y",                                       # -15
    "improperly formed DMS value",                          # -16
    "non-convergent inverse meridional dist",               # -17
    "non-convergent inverse phi2",                          # -18
    "acos/asin: |arg| >1.+1e-14",                           # -19
    "tolerance condition error",                            # -20
    "conic lat_1 = -lat_2",                                 # -21
    "lat_0, lat_1 or lat_2 >= 90",                          # -22
    "lat_1 = 0",                                            # -23
    "lat_ts >= 90",                                         # -24
    "no distance between control points",                   # -25
    "projection not selected to be rotated",                # -26
    "W <= 0 or M <= 0",                                     # -27
    "lsat not in 1-5 range",                                # -28
    "path not in range",                                    # -29
    "h <= 0 or h > 1e10 * a",                               # -30
    "k <= 0",                                               # -31
    "lat_1=lat_2 or lat_1=0 or lat_2=90",                   # -32
    "lat_0 = 0 or 90 or alpha = 90",                        # -33
    "elliptical usage required",                            # -34
    "invalid UTM zone number",                              # -35
    "",  # no longer used                                   # -36
    "failed to find projection to be rotated",              # -37
    "failed to load datum shift file",                      # -38
    "both n & m must be spec'd and > 0",                    # -39
    "n <= 0, n > 1 or not specified",                       # -40
    "lat_1 or lat_2 not specified",                         # -41
    "|lat_1| == |lat_2|",                                   # -42
    "lat_0 is pi/2 from mean lat",                          # -43
    "unparseable coordinate system definition",             # -44
    "geocentric transformation missing z or ellps",         # -45
    "unknown prime meridian conversion id",                 # -46
    "illegal axis orientation combination",                 # -47
    "point not within available datum shift grids",         # -48
    "invalid sweep axis, choose x or y",                    # -49
    "malformed pipeline",                                   # -50
    "unit conversion factor must be > 0",                   # -51
    "invalid scale",                                        # -52
    "non-convergent computation",                           # -53
    "missing required arguments",                           # -54
    "lat_0 = 0",                                            # -55
    "ellipsoidal usage unsupported",                        # -56
    "only one +init allowed for non-pipeline operations",   # -57
    "argument not numerical or out of range",               # -58
    "inconsistent unit type between input and output",      # -59
    "arguments are mutually exclusive",                     # -60
    "generic error of unknown origin",                      # -61
    "network error",                                        # -62
)

_MAX_ERROR = 9999


def strerrno(err: int) -> str | None:
    """proj_errno_string / pj_strerrno (strerrno.cpp:80-113).

    0 → None; positive → system strerror; -1..-len(ERR_LIST) → table;
    other negatives → "invalid projection system error (N)" with N
    clamped to -9999 (codes below -9999 report -9999).
    """
    if err == 0:
        return None
    if err > 0:
        # HAVE_STRERROR branch: the reference returns strerror(err)
        import os

        return os.strerror(err)
    adjusted = _MAX_ERROR if err < -_MAX_ERROR else -err - 1
    if adjusted < len(ERR_LIST):
        return ERR_LIST[adjusted]
    return "invalid projection system error (%d)" % (
        err if err > -_MAX_ERROR else -_MAX_ERROR)


class ProjError(Exception):
    """Raised at *plan time* (operation construction). Runtime per-point
    errors never raise — they flow through the err column."""

    def __init__(self, code: int, message: str = ""):
        self.code = code
        if not message:
            message = strerrno(code) or ""
        super().__init__(f"proj error {code}: {message}")

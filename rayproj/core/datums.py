"""Built-in datum and prime-meridian tables.

Transcribed from the reference (/root/reference/src/datums.cpp:42-99).
``+datum=NAME`` expands to a towgs84/nadgrids definition plus an
ellipsoid; datum_type classification mirrors pj_datum_set
(/root/reference/src/datum_set.cpp).
"""

from __future__ import annotations

from .dms import dms_to_rad

# name -> (definition fragment, ellps name)
DATUM_TABLE: dict[str, tuple[str, str]] = {
    "WGS84": ("towgs84=0,0,0", "WGS84"),
    "GGRS87": ("towgs84=-199.87,74.79,246.62", "GRS80"),
    "NAD83": ("towgs84=0,0,0", "GRS80"),
    "NAD27": ("nadgrids=@conus,@alaska,@ntv2_0.gsb,@ntv1_can.dat", "clrk66"),
    "potsdam": ("nadgrids=@BETA2007.gsb", "bessel"),
    "carthage": ("towgs84=-263.0,6.0,431.0", "clrk80ign"),
    "hermannskogel": (
        "towgs84=577.326,90.129,463.919,5.137,1.474,5.297,2.4232",
        "bessel",
    ),
    "ire65": ("towgs84=482.530,-130.596,564.557,-1.042,-0.214,-0.631,8.15", "mod_airy"),
    "nzgd49": ("towgs84=59.47,-5.04,187.44,0.47,-0.1,1.024,-4.5993", "intl"),
    "OSGB36": ("towgs84=446.448,-125.157,542.060,0.1502,0.2470,0.8421,-20.4894", "airy"),
}

PRIME_MERIDIANS: dict[str, str] = {
    "greenwich": "0dE",
    "lisbon": "9d07'54.862\"W",
    "paris": "2d20'14.025\"E",
    "bogota": "74d04'51.3\"W",
    "madrid": "3d41'16.58\"W",
    "rome": "12d27'8.4\"E",
    "bern": "7d26'22.5\"E",
    "jakarta": "106d48'27.79\"E",
    "ferro": "17d40'W",
    "brussels": "4d22'4.71\"E",
    "stockholm": "18d3'29.8\"E",
    "athens": "23d42'58.815\"E",
    "oslo": "10d43'22.5\"E",
    "copenhagen": "12d34'40.35\"E",
}


def prime_meridian_rad(name_or_value: str) -> float:
    defn = PRIME_MERIDIANS.get(name_or_value, name_or_value)
    return dms_to_rad(defn)


# datum_type values (src/proj_internal.h:285-290)
DATUM_UNKNOWN = 0
DATUM_3PARAM = 1
DATUM_7PARAM = 2
DATUM_GRIDSHIFT = 3
DATUM_WGS84 = 4

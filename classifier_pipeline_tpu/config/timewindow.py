"""Recording time windows (reference src/config/timewindow.py).

RelAbsTime parses absolute times ("21:10") or sunrise/sunset-relative
offsets ("30m", "-1h"). The reference uses the astral package for solar
times; we compute sunrise/sunset with the NOAA solar equations directly
(no dependency), accurate to ~1 minute.
"""

from __future__ import annotations

import datetime
import math


def _julian_day(d: datetime.date) -> float:
    a = (14 - d.month) // 12
    y = d.year + 4800 - a
    m = d.month + 12 * a - 3
    return (
        d.day
        + (153 * m + 2) // 5
        + 365 * y
        + y // 4
        - y // 100
        + y // 400
        - 32045
    )


def sun_times(date: datetime.date, lat: float, lon: float):
    """(sunrise_utc, sunset_utc) as naive UTC datetimes (NOAA approximation)."""
    n = _julian_day(date) - 2451545.0 + 0.0008
    j_star = n - lon / 360.0
    M = math.radians((357.5291 + 0.98560028 * j_star) % 360)
    C = 1.9148 * math.sin(M) + 0.02 * math.sin(2 * M) + 0.0003 * math.sin(3 * M)
    lam = math.radians((math.degrees(M) + C + 180 + 102.9372) % 360)
    j_transit = 2451545.0 + j_star + 0.0053 * math.sin(M) - 0.0069 * math.sin(2 * lam)
    delta = math.asin(math.sin(lam) * math.sin(math.radians(23.4397)))
    lat_r = math.radians(lat)
    cos_h = (
        math.sin(math.radians(-0.833)) - math.sin(lat_r) * math.sin(delta)
    ) / (math.cos(lat_r) * math.cos(delta))
    cos_h = min(1.0, max(-1.0, cos_h))
    h = math.degrees(math.acos(cos_h))
    j_rise = j_transit - h / 360.0
    j_set = j_transit + h / 360.0

    def jd_to_dt(jd):
        unix = (jd - 2440587.5) * 86400.0
        return datetime.datetime.utcfromtimestamp(unix)

    return jd_to_dt(j_rise), jd_to_dt(j_set)


class RelAbsTime:
    """A time that is absolute ("20:30") or relative to sunrise/sunset
    ("+30m", "-1.5h", "0")."""

    def __init__(self, time_str, default_offset=None, default_time=None):
        self.is_relative = False
        self.offset_s = 0
        self.time = None
        self.any_time = False
        if time_str is None or time_str == "":
            if default_offset is not None:
                self.is_relative = True
                self.offset_s = default_offset
            elif default_time is not None:
                self.time = default_time
            else:
                self.any_time = True
            return
        s = str(time_str).strip()
        try:
            parts = s.split(":")
            if len(parts) >= 2:
                self.time = datetime.time(int(parts[0]), int(parts[1]))
                return
        except ValueError:
            pass
        # relative offset: [+-]N[smh]
        mult = 60
        if s and s[-1] in "smh":
            mult = {"s": 1, "m": 60, "h": 3600}[s[-1]]
            s = s[:-1]
        try:
            self.offset_s = float(s) * mult
            self.is_relative = True
        except ValueError:
            self.any_time = True

    def is_after(self):
        return self.is_relative and self.offset_s > 0

    def is_before(self):
        return self.is_relative and self.offset_s < 0


class TimeWindow:
    """Start/stop recording window, optionally sunrise/sunset relative."""

    def __init__(self, start: RelAbsTime, end: RelAbsTime, location=None, altitude=0):
        self.start = start
        self.end = end
        self.location = location  # (lat, lon)
        self.altitude = altitude
        self._last_update = None

    def use_sunrise_sunset(self):
        return self.start.is_relative or self.end.is_relative

    def set_location(self, lat, lon, altitude=0):
        self.location = (lat, lon)
        self.altitude = altitude

    def _resolve(self, now: datetime.datetime):
        start_t, end_t = self.start.time, self.end.time
        if self.use_sunrise_sunset():
            if self.location is None:
                raise ValueError("sunrise/sunset window without location")
            sunrise, sunset = sun_times(now.date(), *self.location)
            # local-time conversion: caller passes local now; approximate by
            # using UTC offset of the host timezone
            local_offset = datetime.datetime.now() - datetime.datetime.utcnow()
            sunrise = sunrise + local_offset
            sunset = sunset + local_offset
            if self.start.is_relative:
                start_t = (
                    sunset + datetime.timedelta(seconds=self.start.offset_s)
                ).time()
            if self.end.is_relative:
                end_t = (
                    sunrise + datetime.timedelta(seconds=self.end.offset_s)
                ).time()
        return start_t, end_t

    def inside_window(self, now: datetime.datetime | None = None) -> bool:
        if self.start.any_time and self.end.any_time:
            return True
        now = now or datetime.datetime.now()
        start_t, end_t = self._resolve(now)
        if start_t is None or end_t is None:
            return True
        t = now.time()
        if start_t <= end_t:
            return start_t <= t <= end_t
        return t >= start_t or t <= end_t  # crosses midnight

#!/usr/bin/env python3
"""Deterministic generator for data/zipcodes.csv (SURVEY.md §3).

Models the reference's zip-code CSV (SampleData/geo_data.csv columns
state_fips,state,state_abbr,zipcode,county,city) WITHOUT copying its
data, and adds a last_updated date column: the reference's last-one-wins
dedup relies on file order (ServiceBusWorker.cs:110), which does not
exist for a distributed multi-split read — an explicit recency column
makes last-wins well-defined at any scale.

~20% of composite keys (zipcode_state_abbr) are emitted 2-4 times with
different attribute rows so the dedup operator has real work.
Fixed seed → byte-identical output; the CSV is checked in.
"""
import csv, random

random.seed(20260812)

STATES = [
    ("1", "Alabama", "AL"), ("2", "Alaska", "AK"), ("4", "Arizona", "AZ"),
    ("5", "Arkansas", "AR"), ("6", "California", "CA"), ("8", "Colorado", "CO"),
    ("9", "Connecticut", "CT"), ("10", "Delaware", "DE"), ("12", "Florida", "FL"),
    ("13", "Georgia", "GA"), ("15", "Hawaii", "HI"), ("16", "Idaho", "ID"),
    ("17", "Illinois", "IL"), ("18", "Indiana", "IN"), ("19", "Iowa", "IA"),
    ("20", "Kansas", "KS"), ("21", "Kentucky", "KY"), ("22", "Louisiana", "LA"),
    ("23", "Maine", "ME"), ("24", "Maryland", "MD"), ("25", "Massachusetts", "MA"),
    ("26", "Michigan", "MI"), ("27", "Minnesota", "MN"), ("28", "Mississippi", "MS"),
    ("29", "Missouri", "MO"), ("30", "Montana", "MT"), ("31", "Nebraska", "NE"),
    ("32", "Nevada", "NV"), ("33", "New Hampshire", "NH"), ("34", "New Jersey", "NJ"),
    ("35", "New Mexico", "NM"), ("36", "New York", "NY"), ("37", "North Carolina", "NC"),
    ("38", "North Dakota", "ND"), ("39", "Ohio", "OH"), ("40", "Oklahoma", "OK"),
    ("41", "Oregon", "OR"), ("42", "Pennsylvania", "PA"), ("44", "Rhode Island", "RI"),
    ("45", "South Carolina", "SC"), ("46", "South Dakota", "SD"), ("47", "Tennessee", "TN"),
    ("48", "Texas", "TX"), ("49", "Utah", "UT"), ("50", "Vermont", "VT"),
    ("51", "Virginia", "VA"), ("53", "Washington", "WA"), ("54", "West Virginia", "WV"),
    ("55", "Wisconsin", "WI"), ("56", "Wyoming", "WY"),
]

COUNTY_WORDS = ["Cedar", "Lake", "Granite", "Summit", "Prairie", "Harbor",
                "Madison", "Franklin", "Union", "Clay", "Pine", "Oak"]
CITY_WORDS = ["Springfield", "Riverton", "Fairview", "Ashland", "Milton",
              "Georgetown", "Clinton", "Greenville", "Bristol", "Salem",
              "Dover", "Hudson", "Arlington", "Burlington", "Winchester"]


def rand_date():
    # 2025-06-01 .. 2026-07-31 (run date for TTL logic is 2026-08-01)
    base = random.randint(0, 425)
    y, rem = (2025, base) if base < 214 else (2026, base - 214)
    # map day offset inside the year segment to (month, day), crude but fixed
    month = {2025: 6, 2026: 1}[y] + rem // 31
    day = rem % 31 + 1
    if day > 28 and month == 2:
        day = 28
    if day > 30 and month in (4, 6, 9, 11):
        day = 30
    return f"{y:04d}-{month:02d}-{day:02d}"


def make_row(fips, state, abbr, zipc):
    county = f"{random.choice(COUNTY_WORDS)} {random.choice(['County','Parish'])}"
    city = random.choice(CITY_WORDS)
    return [fips, state, abbr, zipc, county, city, rand_date()]


rows = []
for fips, state, abbr in STATES:
    base_zip = int(fips) * 1000 + 100
    for i in range(100):  # 100 distinct zips per state
        zipc = f"{(base_zip + i) % 100000:05d}"
        rows.append(make_row(fips, state, abbr, zipc))
        if random.random() < 0.20:  # duplicate key, different attributes
            for _ in range(random.randint(1, 3)):
                rows.append(make_row(fips, state, abbr, zipc))

random.shuffle(rows)

with open("data/zipcodes.csv", "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(["state_fips", "state", "state_abbr", "zipcode", "county",
                "city", "last_updated"])
    w.writerows(rows)

print(f"wrote {len(rows)} rows, "
      f"{len(set((r[3], r[2]) for r in rows))} distinct composite keys")

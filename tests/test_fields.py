"""Field spec + sha1 column naming (reference: src/storage/field.rs:55-59
golden sha1; src/abcd/abcd_fields.rs:78-122 spec load; database_sink.rs:73-88
dataset/unit split)."""

from crawlspark.fields import AbcdFields, sha1_hex
from crawlspark.synth import GOLDEN_SPEC


def test_sha1_golden():
    # the reference's own golden value (src/storage/field.rs:55-59)
    assert sha1_hex("test") == "a94a8fe5ccb19ba61c4c0873d391e987982fbbd3"


def test_spec_load_and_split():
    f = AbcdFields.from_list(GOLDEN_SPEC)
    assert len(f) == 7
    ds, un = f.split()
    assert [x.name.rsplit("/", 1)[-1] for x in ds] == ["Name", "Title", "URI"]
    assert len(un) == 4
    lon = f.value_of(
        "/DataSets/DataSet/Units/Unit/Gathering/SiteCoordinateSets/SiteCoordinates/CoordinatesLatLong/LongitudeDecimal"
    )
    assert lon is not None and lon.numeric and not lon.global_field
    assert len(f.translation_rows()) == 7
    assert all(len(h) == 40 for _, h in f.translation_rows())

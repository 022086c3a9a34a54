"""Ordered hook chain (OsmMapDataSource.java:66-78 subset)."""

import numpy as np
import pandas as pd

from mkgmap_ray.stages.hooks import (
    highway_on_add_way,
    link_destination,
    multipolygon_finish,
)

REMOVABLE = ("destination", "oneway", "destination:street", "name")


def _ways(**over):
    base = {
        "way_id": [1, 2, 3, 4, 5],
        "highway": ["motorway_link", "trunk_link", "motorway",
                    "primary_link", "secondary_link"],
        "junction": [None, "roundabout", None, "roundabout", None],
        "oneway": [None, None, "yes", "-1", None],
        "destination": ["Berlin", None, "X", None, None],
        "destination:lanes": [None, "A|B", None, "Solo", None],
        "destination:lanes:forward": [None, "FL", None, None, None],
        "destination:lanes:backward": [None, None, None, None, None],
        "destination:forward": [None, "Fwd", None, None, None],
        "destination:backward": [None, None, None, "Bwd", None],
        "destination:street": [None, "St2", None, None, "St5"],
        "name": ["n1", None, "n3", None, None],
        "mkgmap:removetags": [None, None, None, None, None],
    }
    base.update(over)
    return pd.DataFrame(base)


class TestHookSteps:
    def test_roundabout_oneway(self):
        out = highway_on_add_way(_ways())
        # way 2: roundabout, no oneway -> yes; way 4 keeps explicit -1
        assert out.loc[1, "oneway"] == "yes"
        assert out.loc[3, "oneway"] == "-1"
        assert out.loc[0, "oneway"] is None

    def test_removetags(self):
        df = _ways(**{"mkgmap:removetags": [
            "destination", "oneway;destination:street", None, "name", None
        ]})
        out = multipolygon_finish(df, REMOVABLE)
        assert out.loc[0, "destination"] is None
        assert out.loc[1, "oneway"] is None
        assert out.loc[1, "destination:street"] is None
        assert out["mkgmap:removetags"].isna().all()
        # untouched rows keep their tags
        assert out.loc[2, "destination"] == "X"

    def test_destination_cascade(self):
        out = link_destination(highway_on_add_way(_ways()))
        got = list(zip(out["mkgmap:dest_hint_work"],
                       out["mkgmap:dest_source"]))
        # 1: destination wins outright
        assert got[0] == ("Berlin", "destination")
        # 2: lanes "A|B" is lane-specific, which BLOCKS the lanes path
        #    entirely (directed lanes only substitute when
        #    destination:lanes is absent, LinkDestinationHook.java:135);
        #    roundabout made it oneway=yes -> destination:forward
        assert got[1] == ("Fwd", "destination:forward")
        # 3: not a link type -> nothing
        assert got[2] == (None, None)
        # 4: lane-unspecific destination:lanes wins over directed dest
        assert got[3] == ("Solo", "destination:lanes")
        # 5: falls through to destination:street
        assert got[4] == ("St5", "destination:street")

    def test_chain_order_matters(self):
        """Running MultiPolygonFinish BEFORE vs AFTER the parse-time
        roundabout hook changes the surviving oneway; running
        LinkDestination BEFORE removetags sees a destination that the
        correct order deletes."""
        df = _ways(**{"mkgmap:removetags": [
            "destination", "oneway;destination:street", None, None, None
        ]})
        correct = link_destination(
            multipolygon_finish(highway_on_add_way(df), REMOVABLE)
        )
        wrong = multipolygon_finish(
            link_destination(highway_on_add_way(df)), REMOVABLE
        )
        # correct: way 1's destination removed -> no hint at all
        assert correct.loc[0, "mkgmap:dest_hint_work"] is None
        # wrong order: hint escaped the removal
        assert wrong.loc[0, "mkgmap:dest_hint_work"] == "Berlin"
        # correct: way 2 roundabout oneway survives (removetags only
        # hits oneway on way 2) -> actually removed; wrong order where
        # removal ran first then roundabout re-added it:
        re_added = highway_on_add_way(
            multipolygon_finish(highway_on_add_way(df), REMOVABLE)
        )
        assert correct.loc[1, "oneway"] is None
        assert re_added.loc[1, "oneway"] == "yes"


class TestResidentialTagger:
    def test_broadcast_box_match(self, ray_session):
        import ray

        from mkgmap_ray.stages.hooks import ResidentialTagger

        bid = np.array([7, 3], np.int64)
        name = np.array(["big", "small"], object)
        y0 = np.array([0, 10], np.int64)
        y1 = np.array([100, 20], np.int64)
        x0 = np.array([0, 10], np.int64)
        x1 = np.array([100, 20], np.int64)
        ref = ray.put((bid, name, y0, y1, x0, x1))
        tagger = ResidentialTagger(ref)
        df = pd.DataFrame(
            {
                "wy": [15, 50, 200],
                "wx": [15, 50, 200],
                "landuse": [None, "residential", None],
            }
        )
        out = tagger(df)
        # inside both boxes -> smallest id (3, "small") wins
        assert out.loc[0, "mkgmap:residential"] == "small"
        # landuse=residential never self-tags
        assert out.loc[1, "mkgmap:residential"] is None
        assert out.loc[2, "mkgmap:residential"] is None

"""AL_EXT_debug: message log, filtering, groups, labels (al/debug.cpp)."""

import numpy as np

from openal_soft_tpu.al import api, debug as dbg


def _fresh_ctx():
    dev = api.alcLoopbackOpenDeviceSOFT(frequency=48000, capacity=8)
    ctx = api.alcCreateContext(dev)
    api.alcMakeContextCurrent(ctx)
    return dev, ctx


def test_log_and_filtering():
    _fresh_ctx()
    assert api.alIsExtensionPresent("AL_EXT_debug")
    api.alDebugMessageInsertEXT(dbg.AL_DEBUG_SOURCE_APPLICATION_EXT,
                                dbg.AL_DEBUG_TYPE_MARKER_EXT, 7,
                                dbg.AL_DEBUG_SEVERITY_HIGH_EXT, "hello")
    # LOW severity is filtered by default (debug.cpp Context ctor).
    api.alDebugMessageInsertEXT(dbg.AL_DEBUG_SOURCE_APPLICATION_EXT,
                                dbg.AL_DEBUG_TYPE_MARKER_EXT, 8,
                                dbg.AL_DEBUG_SEVERITY_LOW_EXT, "low")
    log = api.alGetDebugMessageLogEXT(16)
    assert [(e[2], e[4]) for e in log] == [(7, "hello")]

    # Disable by severity, re-enable a specific id.
    api.alDebugMessageControlEXT(dbg.AL_DONT_CARE_EXT, dbg.AL_DONT_CARE_EXT,
                                 dbg.AL_DEBUG_SEVERITY_HIGH_EXT, (), False)
    api.alDebugMessageInsertEXT(dbg.AL_DEBUG_SOURCE_APPLICATION_EXT,
                                dbg.AL_DEBUG_TYPE_MARKER_EXT, 9,
                                dbg.AL_DEBUG_SEVERITY_HIGH_EXT, "hidden")
    api.alDebugMessageControlEXT(dbg.AL_DEBUG_SOURCE_APPLICATION_EXT,
                                 dbg.AL_DEBUG_TYPE_MARKER_EXT,
                                 dbg.AL_DONT_CARE_EXT, (9,), True)
    api.alDebugMessageInsertEXT(dbg.AL_DEBUG_SOURCE_APPLICATION_EXT,
                                dbg.AL_DEBUG_TYPE_MARKER_EXT, 9,
                                dbg.AL_DEBUG_SEVERITY_HIGH_EXT, "visible")
    log = api.alGetDebugMessageLogEXT(16)
    assert [e[4] for e in log] == ["visible"]


def test_callback_and_disable():
    _fresh_ctx()
    got = []
    api.alDebugMessageCallbackEXT(
        lambda *a: got.append(a), user_param="up")
    api.alDebugMessageInsertEXT(dbg.AL_DEBUG_SOURCE_APPLICATION_EXT,
                                dbg.AL_DEBUG_TYPE_OTHER_EXT, 1,
                                dbg.AL_DEBUG_SEVERITY_MEDIUM_EXT, "cb")
    assert got and got[0][4] == "cb" and got[0][5] == "up"
    api.alDisable(dbg.AL_DEBUG_OUTPUT_EXT)
    api.alDebugMessageInsertEXT(dbg.AL_DEBUG_SOURCE_APPLICATION_EXT,
                                dbg.AL_DEBUG_TYPE_OTHER_EXT, 2,
                                dbg.AL_DEBUG_SEVERITY_MEDIUM_EXT, "off")
    assert len(got) == 1
    api.alEnable(dbg.AL_DEBUG_OUTPUT_EXT)
    assert api.alIsEnabled(dbg.AL_DEBUG_OUTPUT_EXT)


def test_groups_inherit_and_pop():
    _fresh_ctx()
    api.alPushDebugGroupEXT(dbg.AL_DEBUG_SOURCE_APPLICATION_EXT, 42, "grp")
    # Filter change inside the group...
    api.alDebugMessageControlEXT(dbg.AL_DONT_CARE_EXT, dbg.AL_DONT_CARE_EXT,
                                 dbg.AL_DEBUG_SEVERITY_HIGH_EXT, (), False)
    api.alDebugMessageInsertEXT(dbg.AL_DEBUG_SOURCE_APPLICATION_EXT,
                                dbg.AL_DEBUG_TYPE_MARKER_EXT, 1,
                                dbg.AL_DEBUG_SEVERITY_HIGH_EXT, "in-group")
    api.alPopDebugGroupEXT()
    # ...is restored on pop.
    api.alDebugMessageInsertEXT(dbg.AL_DEBUG_SOURCE_APPLICATION_EXT,
                                dbg.AL_DEBUG_TYPE_MARKER_EXT, 2,
                                dbg.AL_DEBUG_SEVERITY_HIGH_EXT, "after-pop")
    msgs = [e[4] for e in api.alGetDebugMessageLogEXT(16)]
    assert "in-group" not in msgs
    assert "grp" in msgs            # push notification
    assert "after-pop" in msgs
    # Popping the default group is a stack underflow error.
    api.alPopDebugGroupEXT()
    assert api.alGetError() == dbg.AL_STACK_UNDERFLOW_EXT


def test_object_labels():
    _fresh_ctx()
    sid = api.alGenSources(1)
    api.alObjectLabelEXT("source", sid, "player-footsteps")
    assert api.alGetObjectLabelEXT("source", sid) == "player-footsteps"
    api.alObjectLabelEXT("source", sid, None)
    assert api.alGetObjectLabelEXT("source", sid) == ""

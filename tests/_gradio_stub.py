"""Minimal gradio stub: records the Blocks/callback graph so
serve/app.main's REAL construction path executes in tests (gradio itself
is not installed in this environment — r3 verdict item 8).

Components are plain recorders; `Button.click(fn, inputs, outputs)` stores
the binding so tests can execute the real callbacks and check payload
arity against the declared output lists.
"""


class _Ctx:
    def __init__(self, *a, **kw):
        self.kwargs = kw

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class _Component:
    def __init__(self, *a, **kw):
        self.args = a
        self.kwargs = kw


class Blocks(_Ctx):
    instances = []

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.clicks = []           # (fn, inputs, outputs)
        self.launched = None
        Blocks.instances.append(self)
        Blocks._current = self

    def launch(self, **kw):
        self.launched = kw


class Tab(_Ctx):
    pass


class Tabs(_Ctx):
    pass


class Row(_Ctx):
    pass


class Column(_Ctx):
    pass


class Button(_Component):
    def click(self, fn, inputs, outputs):
        Blocks._current.clicks.append((fn, inputs, outputs))


class Image(_Component):
    pass


class Video(_Component):
    pass


class HTML(_Component):
    pass


class Markdown(_Component):
    pass


class Code(_Component):
    pass


class DownloadButton(Button):
    pass


class Dataframe(_Component):
    pass


class Gallery(_Component):
    pass

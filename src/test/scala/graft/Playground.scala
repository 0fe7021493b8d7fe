package graft

/** Reference playground fixtures, encoded verbatim
  * (cascalog-core/src/clj/cascalog/playground.clj:27-212). */
object Playground {
  val person: Seq[Seq[Any]] = Seq("alice", "bob", "chris", "david", "emily",
    "george", "gary", "harold", "kumar", "luanne").map(Seq(_))

  val age: Seq[Seq[Any]] = Seq(
    Seq("alice", 28L), Seq("bob", 33L), Seq("chris", 40L), Seq("david", 25L),
    Seq("emily", 25L), Seq("george", 31L), Seq("gary", 28L), Seq("kumar", 27L),
    Seq("luanne", 36L))

  val gender: Seq[Seq[Any]] = Seq(
    Seq("alice", "f"), Seq("bob", "m"), Seq("chris", "m"), Seq("david", "m"),
    Seq("emily", "f"), Seq("george", "m"), Seq("gary", "m"), Seq("harold", "m"),
    Seq("luanne", "f"))

  val fullNames: Seq[Seq[Any]] = Seq(
    Seq("alice", "Alice Smith"), Seq("bob", "Bobby John Johnson"),
    Seq("chris", "CHRIS"), Seq("david", "A B C D E"),
    Seq("emily", "Emily Buchanan"), Seq("george", "George Jett"))

  val location: Seq[Seq[Any]] = Seq(
    Seq("alice", "usa", "california", null),
    Seq("bob", "canada", null, null),
    Seq("chris", "usa", "pennsylvania", "philadelphia"),
    Seq("david", "usa", "california", "san francisco"),
    Seq("emily", "france", null, null),
    Seq("gary", "france", null, "paris"),
    Seq("luanne", "italy", null, null))

  val follows: Seq[Seq[Any]] = Seq(
    Seq("alice", "david"), Seq("alice", "bob"), Seq("alice", "emily"),
    Seq("bob", "david"), Seq("bob", "george"), Seq("bob", "luanne"),
    Seq("david", "alice"), Seq("david", "luanne"), Seq("emily", "alice"),
    Seq("emily", "bob"), Seq("emily", "george"), Seq("emily", "gary"),
    Seq("george", "gary"), Seq("harold", "bob"), Seq("luanne", "harold"),
    Seq("luanne", "gary"))

  val numPair: Seq[Seq[Any]] = Seq(
    Seq(1L, 2L), Seq(0L, 0L), Seq(1L, 1L), Seq(4L, 4L), Seq(5L, 10L),
    Seq(2L, 7L), Seq(3L, 6L), Seq(8L, 64L), Seq(8L, 3L), Seq(4L, 0L))

  val integer: Seq[Seq[Any]] = (-1L to 9L).map(Seq[Any](_))

  val sentence: Seq[Seq[Any]] = Seq(
    "Four score and seven years ago our fathers brought forth on this continent a new nation",
    "conceived in Liberty and dedicated to the proposition that all men are created equal",
    "Now we are engaged in a great civil war testing whether that nation or any nation so",
    "conceived and so dedicated can long endure We are met on a great battlefield of that war",
    "We have come to dedicate a portion of that field as a final resting place for those who",
    "here gave their lives that that nation might live It is altogether fitting and proper",
    "that we should do this",
    "But in a larger sense we can not dedicate  we can not consecrate  we can not hallow",
    "this ground The brave men living and dead who struggled here have consecrated it",
    "far above our poor power to add or detract The world will little note nor long remember",
    "what we say here but it can never forget what they did here It is for us the living rather",
    "to be dedicated here to the unfinished work which they who fought here have thus far so nobly",
    "advanced It is rather for us to be here dedicated to the great task remaining before us ",
    "that from these honored dead we take increased devotion to that cause for which they gave",
    "the last full measure of devotion  that we here highly resolve that these dead shall",
    "not have died in vain  that this nation under God shall have a new birth of freedom",
    "and that government of the people by the people for the people shall not perish",
    "from the earth").map(Seq(_))

  val duprows: Seq[Seq[Any]] = Seq(
    Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), Seq(1L, 2L, 5L), Seq(1L, 3L, 6L),
    Seq(2L, 5L, 7L), Seq(2L, 2L, 2L))

  val dirtyAges: Seq[Seq[Any]] = Seq(
    Seq(1200L, "alice", 20L), Seq(1000L, "bob", 25L), Seq(1500L, "harry", 46L),
    Seq(1800L, "alice", 19L), Seq(2000L, "bob", 30L))
}
